from .mesh import make_mesh, HALF_AXIS, DATA_AXIS
