from . import boxes, crop, geometry, nms, preprocess  # noqa: F401
