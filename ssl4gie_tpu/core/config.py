"""Typed configuration for all tasks.

Replaces the reference's per-script argparse grammar (see reference
`Classification/train_classification.py:372-411` and README.md:81-119) with one validated
dataclass hierarchy. The CLI (`ssl4gie_tpu/cli`) maps the exact reference flag names onto
these fields, so a reference user can reuse their command lines unchanged.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class Architecture(str, enum.Enum):
    RESNET50 = "resnet50"
    VIT_B = "vit_b"
    # MoCo v3 pretrain-only variants (`Models/moco_v3/vits.py:117-144`);
    # downstream SSL4GIE tasks take only vit_b / resnet50 backbones
    VIT_S = "vit_s"
    VIT_CONV_S = "vit_conv_s"
    VIT_CONV_B = "vit_conv_b"
    # MAE pretrain-only size presets (`Models/mae/models_mae.py:223-250`:
    # mae_vit_{base,large,huge}); SSL4GIE's published recipe uses vit_b
    VIT_L = "vit_l"
    VIT_H = "vit_h"


class Pretraining(str, enum.Enum):
    HYPERKVASIR = "Hyperkvasir"          # SSL on Hyperkvasir-unlabelled (needs --ss-framework + ckpt)
    IMAGENET_CLASS = "ImageNet_class"    # supervised ImageNet weights
    IMAGENET_SELF = "ImageNet_self"      # SSL on ImageNet (needs --ss-framework + ckpt)
    RANDOM = "random"                    # random init


class SSLFramework(str, enum.Enum):
    BARLOWTWINS = "barlowtwins"
    MOCOV3 = "mocov3"
    MAE = "mae"


class Task(str, enum.Enum):
    CLASSIFICATION = "classification"
    SEGMENTATION = "segmentation"
    DETECTION = "detection"
    DEPTH = "depth"


# Valid (task, architecture, pretraining, framework) combinations, mirroring the implicit
# if/else validation in each reference build() (e.g. train_segmentation.py:150-155 allows
# barlowtwins only via RN50; train_depth.py:174-177 is the only dense task allowing it).
_DENSE_TASKS = {Task.SEGMENTATION, Task.DEPTH}


def validate_combination(task: Task, arch: Architecture, pretraining: Pretraining,
                         framework: Optional[SSLFramework]) -> None:
    if arch not in (Architecture.RESNET50, Architecture.VIT_B):
        raise ValueError(
            f"architecture={arch.value} is MoCo-v3-pretrain-only; downstream "
            "tasks support resnet50 / vit_b")
    if pretraining in (Pretraining.HYPERKVASIR, Pretraining.IMAGENET_SELF):
        if framework is None:
            raise ValueError(
                f"pretraining={pretraining.value} requires --ss-framework "
                "(barlowtwins|mocov3|mae)")
        if framework == SSLFramework.MAE and arch != Architecture.VIT_B:
            raise ValueError("MAE pretraining is ViT-only")
        if framework == SSLFramework.BARLOWTWINS:
            if arch != Architecture.RESNET50:
                raise ValueError("Barlow Twins pretraining is ResNet50-only")
            # In the reference, BT ResNet50 is used for classification, segmentation
            # (via DeepLabV3+), depth and detection; all tasks accept it with RN50.
    else:
        if framework is not None:
            raise ValueError(
                f"--ss-framework is only valid with Hyperkvasir/ImageNet_self "
                f"pretraining, got pretraining={pretraining.value}")


@dataclasses.dataclass
class DataConfig:
    dataset: str = ""                  # Kvasir | CVC | C3VD | Hyperkvasir-labelled dirs
    data_root: str = ""
    batch_size: int = 16               # reference default 16; paper used 48
    num_workers: int = 8
    img_size: int = 224                # detection uses 1024 for ViT
    synthetic: bool = False            # synthetic data for tests/benches (no files needed)
    synthetic_size: int = 64           # number of synthetic samples


@dataclasses.dataclass
class OptimConfig:
    learning_rate: float = 1e-4        # reference AdamW default (train_*.py)
    weight_decay: float = 0.0          # torch AdamW default is 1e-2; reference uses default
    use_plateau_scheduler: bool = True  # --learning-rate-scheduler (default true in reference)
    plateau_factor: float = 0.5
    plateau_patience: int = 10
    min_lr: float = 1e-6               # --learning-rate-scheduler-minimum
    accum_steps: int = 1               # detection --accum_iter
    grad_clip: Optional[float] = None
    layer_decay: Optional[float] = None  # BEiT layer-wise LR decay (mae/util/lr_decay.py)
    # MAE supervised-finetune recipe extras (`main_finetune.py:219-226`); the
    # SSL4GIE GIE tasks leave them off (0.0 = disabled)
    mixup: float = 0.0                 # --mixup alpha (MAE default 0.8)
    cutmix: float = 0.0                # --cutmix alpha (MAE default 1.0)
    label_smoothing: float = 0.0       # --smoothing (MAE default 0.1)
    drop_path: float = 0.0             # --drop_path stochastic depth (MAE 0.1)
    # timm-style train augmentation (the vendored finetune recipe's defaults
    # `main_finetune.py:82,88`: --aa rand-m9-mstd0.5-inc1, --reprob 0.25).
    # auto_augment None/"" leaves the SSL4GIE GI-task augmentation stack on.
    auto_augment: Optional[str] = None
    reprob: float = 0.0
    # torch AdamW defaults that the reference inherits:
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    adamw_weight_decay: float = 1e-2   # torch default WD actually applied by reference AdamW


@dataclasses.dataclass
class RuntimeConfig:
    seed: int = 42                     # the reference seeds python/numpy/torch with 42
    mesh_shape: Optional[tuple] = None  # None -> 1-D data mesh over all devices
    mesh_axes: tuple = ("data",)
    # >1 -> 2-D (data, model) mesh with Megatron-style ViT param sharding
    # (parallel/tp.py; beyond-reference extension, must divide num_heads)
    tensor_parallel: int = 1
    # ZeRO/FSDP-style param+optimizer sharding over the data axis (shape-
    # based, composes with tensor_parallel into hybrid 2-D sharding)
    fsdp: bool = False
    compute_dtype: str = "bfloat16"    # AMP equivalent: bf16 compute, fp32 params/opt
    donate_state: bool = True
    log_every: int = 10
    profile_dir: Optional[str] = None  # jax.profiler trace output
    tensorboard: bool = False          # also emit tfevents scalars (core.tb)
    scan_steps: int = 8                # pretrain steps scanned per jit dispatch
    # (keeps python/dispatch latency out of the hot loop; 1 = per-step calls)


@dataclasses.dataclass
class TrainConfig:
    task: Task = Task.CLASSIFICATION
    architecture: Architecture = Architecture.VIT_B
    pretraining: Pretraining = Pretraining.RANDOM
    ss_framework: Optional[SSLFramework] = None
    checkpoint: Optional[str] = None   # external pretrained ckpt to convert+load
    frozen: bool = False               # freeze encoder, train head/decoder only
    probe: bool = False                # linear-probe recipe (main_lincls/main_linprobe)
    epochs: int = 50                   # 50 cls/depth, 200 seg/det in reference
    out_token: str = "cls"             # cls | spatial | global_pool (ViT pooled output;
    # global_pool = MAE finetune recipe: pre-norm patch mean + fc_norm)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
    ckpt_dir: str = "Trained models"   # same layout as the reference
    log_dir: str = "Trained models"

    def validate(self) -> "TrainConfig":
        validate_combination(self.task, self.architecture, self.pretraining,
                             self.ss_framework)
        if self.task == Task.DETECTION and self.architecture == Architecture.VIT_B:
            self.data.img_size = 1024
        if self.probe:
            if self.task != Task.CLASSIFICATION:
                raise ValueError("--probe is a linear-classification protocol "
                                 "(main_lincls.py / main_linprobe.py)")
            if self.ss_framework not in (SSLFramework.MOCOV3, SSLFramework.MAE):
                raise ValueError("--probe requires --ss-framework mocov3 or mae "
                                 "(the reference has probe scripts only for "
                                 "those frameworks)")
        if ((self.optim.auto_augment or self.optim.reprob > 0
             or self.optim.drop_path > 0)
                and self.task != Task.CLASSIFICATION):
            # the timm finetune-recipe knobs only exist on the MAE finetune
            # path (`Models/mae/main_finetune.py:57,82,88`)
            raise ValueError("--aa/--reprob/--drop-path apply to "
                             "classification finetuning only")
        return self

    def run_name(self) -> str:
        """Checkpoint/log base name, matching the reference scheme
        (`train_classification.py:203-208`):
        {arch}-{pretraining}[_{ssf}]_init-frozen_{frozen}-dataset_{dataset}
        """
        pre = self.pretraining.value
        if self.ss_framework is not None:
            pre = f"{pre}_{self.ss_framework.value}"
        return (f"{self.architecture.value}-{pre}_init-frozen_{self.frozen}"
                f"-dataset_{self.data.dataset}")


@dataclasses.dataclass
class PretrainConfig:
    """SSL pretraining config (MoCo v3 / MAE on Hyperkvasir-unlabelled)."""
    framework: SSLFramework = SSLFramework.MAE
    architecture: Architecture = Architecture.VIT_B
    epochs: int = 400
    warmup_epochs: int = 40
    base_lr: float = 1.5e-4            # MAE blr; scaled by batch/256
    weight_decay: float = 0.05
    batch_size: int = 768
    img_size: int = 224
    mask_ratio: float = 0.75           # MAE
    norm_pix_loss: bool = True         # MAE
    moco_dim: int = 256
    moco_mlp_dim: int = 4096
    moco_momentum: float = 0.99
    moco_temperature: float = 0.2
    moco_stop_grad_patch_embed: bool = True   # --stop-grad-conv1 (ViT recipe)
    optimizer: str = "adamw"           # adamw | lars
    # retained numbered checkpoints: every `save_every` epochs a full-state
    # slot is kept (None -> framework default: MoCo every epoch like
    # `main_moco.py:310-316`, MAE every 20 + last like `main_pretrain.py:197`);
    # keep_last prunes to the newest N numbered slots (0 = keep all, the
    # reference behavior)
    save_every: Optional[int] = None
    keep_last: int = 0
    model_kwargs: dict = dataclasses.field(default_factory=dict)  # size overrides (tests)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)
    ckpt_dir: str = "Pretrained models"
