"""face_detection_and_recognition_tpu — a TPU-native face detection / embedding /
dataset-curation framework built on JAX/XLA/Pallas.

Re-designed (not ported) from the multi-backend CPU/GPU reference toolkit
SamSamhuns/face_detection_and_recognition: the per-runtime ``Model``-subclass zoo
(OpenCV-DNN, ONNXRuntime, TensorFlow, OpenVINO, Triton) collapses into a single
engine where preprocessing, detector backbones, anchor decoding, NMS, face
cropping, embedding and similarity search are pure jittable functions over
batched, statically-shaped tensors living in HBM.

Layout:
    ops/        geometry / NMS / preprocessing / crop kernels (jnp + Pallas)
    models/     detector + embedder architectures (flax.linen, NHWC)
    core/       Detections contract, postprocessing, the FaceEngine
    parallel/   device mesh, sharding rules, collectives
    pipelines/  batched dataset workloads (extraction, filtering, tracking)
    serving/    in-process ensemble service (Triton-ensemble equivalent)
    train/      training steps (ArcFace embedder, detector fine-tune)
    utils/      files / drawing / CLI / logging
"""

__version__ = "0.1.0"
