from . import binda, convert, vtk, vtu
