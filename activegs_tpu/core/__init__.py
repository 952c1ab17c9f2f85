from . import geometry, image_ops, quaternions  # noqa: F401
