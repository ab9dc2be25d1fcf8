from .detections import Detections, PostProcessedDetection, postprocess_detections  # noqa: F401
