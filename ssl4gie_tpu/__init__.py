"""SSL4GIE-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
ESandML/SSL4GIE — self-supervised pretraining (MoCo v3, MAE, Barlow Twins ingestion) and
downstream finetuning / evaluation / prediction of ResNet50 and ViT-B backbones on
gastrointestinal-endoscopy vision tasks.

Built from scratch for TPU: SPMD data parallelism over a `jax.sharding.Mesh`, bf16 compute,
jitted train/eval steps, Pallas kernels for hot ops, Orbax checkpointing, and converters
for the reference's PyTorch/timm checkpoint formats.

Reference (behavioral spec only): /root/reference (ESandML/SSL4GIE).
"""

__version__ = "0.1.0"
