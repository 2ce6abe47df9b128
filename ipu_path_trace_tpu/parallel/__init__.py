from .mesh import make_mesh, sharded_render_step, parse_mesh_shape
