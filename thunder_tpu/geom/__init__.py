from . import quat, symmetry, directional
