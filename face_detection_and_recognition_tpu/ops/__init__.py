from . import boxes, geometry, nms, preprocess  # noqa: F401
