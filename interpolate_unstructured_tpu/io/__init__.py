from . import binda, convert, vtk, vtu
from . import checkpoint
