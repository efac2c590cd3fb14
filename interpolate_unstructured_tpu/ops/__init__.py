from . import geometry, interp, locate
