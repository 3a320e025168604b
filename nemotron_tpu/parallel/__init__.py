from .mesh import make_mesh, param_shardings, state_shardings  # noqa: F401
