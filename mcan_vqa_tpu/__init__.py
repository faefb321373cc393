"""mcan_vqa_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of the MCAN-VQA reference (Deep Modular Co-Attention Networks,
CVPR 2019), rebuilt from scratch for TPU hardware.

Subpackages
-----------
configs   three-tier configuration (dataclass defaults / YAML / CLI)
data      pure text/answer processing, feature readers, device input pipeline
models    Flax modules: LSTM question encoder, MCA_ED co-attention, AttFlat
ops       Pallas TPU kernels (fused masked attention, fused AttFlat) + XLA refs
parallel  mesh construction and sharding rules (dp / tp axes, pjit wiring)
train     optax optimizer + warmup/decay schedule, jitted train step, orbax ckpt
evals     official VQA soft-accuracy protocol, ROC-AUC
utils     logging, profiling, attention visualization
cli       run.py / run_mimic.py compatible entry points
"""

__version__ = "0.1.0"
