"""popnet_tpu — a TPU-native multi-person 3D human-pose framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
PoP-Net / MP-3DHP benchmark stack (reference: oppo-us-research/PoP-Net):

- depth-image data pipeline with background / multi-person augmentation
  compositing as fused on-device ops,
- dense GT encoders (heatmap / PAF / z-map / align-map / prior anchors) as
  closed-form vectorized array programs,
- the model families Open-Pose+ (rtpose_light3d), Yolo-Pose+ (YoloPoseNet),
  Yolo-A2J, and PoP-Net (align3d heads + prior subnet) as Flax modules,
- batched on-device post-processing (peak NMS, PAF assembly, prior decode)
  with a C++ host fallback for the greedy assembly,
- the best-match PCK / PCKh / mAP evaluation protocol,
- pjit/shard_map data-parallel training over a TPU device mesh.

Layout:
    core/     constants, camera geometry, configuration
    ops/      vectorized GT-map encoders + Pallas kernels
    data/     dataset readers, augmentation, compositing pipelines
    models/   Flax model definitions
    losses/   training losses
    decode/   inference post-processing (maps -> people)
    native/   C++ host-side components
    eval/     PCK / mAP metrics (NumPy reference + batched JAX)
    train/    training loops, checkpointing, schedules
    parallel/ mesh + sharding helpers
    cli/      command-line entry points
    viz/      visualization utilities
"""

__version__ = "0.1.0"
