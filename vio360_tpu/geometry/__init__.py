from . import camera, essential, lie, triangulation  # noqa: F401
