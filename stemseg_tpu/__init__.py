"""stemseg_tpu — a TPU-native (JAX/XLA/Pallas) framework for spatio-temporal
embedding based video instance segmentation, with the capabilities of the
STEm-Seg reference (sabarim/STEm-Seg, ECCV 2020).

Layer map (mirrors reference `stemseg/` — see SURVEY.md §1):

    training/  inference/      — runtimes (CLI entry points)
    models/                    — backbone + 3D decoders (flax.linen, NHWC/NDHWC)
    losses/                    — embedding / Lovász / CE / fg-BCE losses
    ops/                       — fused JAX + Pallas TPU kernels (clustering, ...)
    parallel/                  — mesh construction, sharded train step (pjit)
    data/                      — host-side dataset parsers, samplers, augmenters
    structures/                — clip-batch geometry (resize / pad-to-32)
    config/                    — typed, immutable config tree + YAML presets
    utils/                     — registry, timers, constants, RLE codec, vis
"""

__version__ = "0.1.0"
