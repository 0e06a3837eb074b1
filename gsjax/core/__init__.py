from gsjax.core import transforms, sh, sg, quaternion  # noqa: F401
