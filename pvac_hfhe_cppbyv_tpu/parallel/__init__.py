from .mesh import make_mesh, default_mesh_shape
from .engine import DeviceEngine
