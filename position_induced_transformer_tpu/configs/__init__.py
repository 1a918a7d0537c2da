"""Benchmark configurations — the seven reference experiments as data.

The reference hard-codes hyperparameters as module constants in seven
driver scripts (e.g. train_burgers.py:51-57, train_darcy.py:62-71); here
they are frozen dataclasses consumed by one unified runner
(``position_induced_transformer_tpu.train.runner``). Values mirror
BASELINE.md / SURVEY.md §6 exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    space_dim: int
    in_dim: int
    out_dim: int
    hid_dim: int
    n_head: int
    n_blocks: int
    en_loc: float
    de_loc: float
    concat_mesh: bool = True
    use_instance_norm: bool = False
    residual_output: bool = False
    # fused Pallas position attention: engaged automatically on TPU for
    # shapes where it wins (models/pit.py _dispatch_posatt)
    fused_kernel: bool = True
    # mixed precision: 'bfloat16' runs the network activations in bf16
    # (params/softmax/masks/model output stay f32 — models/pit.py);
    # opt-in via --set model.compute_dtype=bfloat16
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class BenchmarkConfig:
    name: str
    model: ModelConfig
    metric: str  # 'euclidean' | 'periodic1d' | 'periodic2d'
    ntrain: int
    ntest: int
    batch_size: int
    epochs: int
    lr: float = 1e-3
    warmup_steps: int = 0  # opt-in linear LR warmup before the cosine
    # decay (0 = the reference schedule exactly). A generic stabilizer
    # for configs that sit on a stability knife-edge from init, e.g.
    # vorticity_tf's norm-free 20-step trajectory loss (BASELINE.md);
    # set via --set warmup_steps=K
    loss_p: int = 2
    eval_batch_size: Optional[int] = None
    rollout_steps: int = 0  # BPTT rollout length during training
    trajectory_loss: bool = False  # TF rollout loss: one rel_norm_step over
    # the whole unrolled trajectory (tensorflow/4_Vorticity/train.py:40)
    memory: int = 0  # input time-window width (vorticity)
    swap_loss_args: bool = False  # reference passes (pred, true) here
    normalize_x: bool = False
    normalize_y: bool = False  # denormalize inside the loss (Darcy)
    grid: Optional[Tuple[int, ...]] = None  # spatial grid, e.g. (43, 43)
    latent_grid: Optional[Tuple[int, ...]] = None
    domain: Tuple[float, float] = (0.0, 1.0)
    periodic_grid: bool = False  # drop grid endpoint
    seed: int = 0
    model_variant: str = "pit"  # ablation baselines for the TF-family
    # benchmarks (reference swaps one constructor line per driver,
    # tensorflow/1_InviscidBurgers/train.py:38-40): 'pit' | 'lite'
    # (self-attention processor) | 'transformer' (all self-attention, no
    # latent downsampling) | 'selfpit' (hybrid dot-product + distance-bias
    # attention; requires latent == query resolution)


BURGERS = BenchmarkConfig(
    name="burgers",
    # reference: train_burgers.py:51-78
    model=ModelConfig(1, 1, 1, 64, 2, 5, 0.02, 0.02),
    metric="periodic1d",
    ntrain=1024, ntest=128, batch_size=8, epochs=500, loss_p=1,
    grid=(1024,), latent_grid=(256,), periodic_grid=True,
)

SOD = BenchmarkConfig(
    name="sod",
    # reference: train_sod.py:55-84 (mesh resolution comes from the data)
    model=ModelConfig(1, 3, 3, 32, 1, 2, 0.02, 0.02),
    metric="euclidean",
    ntrain=1024, ntest=128, batch_size=8, epochs=500, loss_p=1,
    grid=None, latent_grid=(256,), domain=(-5.0, 5.0), periodic_grid=True,
)

DARCY = BenchmarkConfig(
    name="darcy",
    # reference: train_darcy.py:62-118 (30 epochs; ZSSR eval at 421^2)
    model=ModelConfig(2, 1, 1, 64, 2, 4, 0.02, 0.02),
    metric="euclidean",
    ntrain=1024, ntest=100, batch_size=8, eval_batch_size=10, epochs=30,
    loss_p=2, normalize_x=True, normalize_y=True,
    grid=(43, 43), latent_grid=(16, 16),
)

VORTICITY = BenchmarkConfig(
    name="vorticity",
    # reference: train_vorticity.py:65-113
    model=ModelConfig(2, 10, 1, 256, 2, 4, 0.02, 0.02, use_instance_norm=True),
    metric="periodic2d",
    ntrain=1000, ntest=200, batch_size=20, epochs=500, loss_p=2,
    rollout_steps=20, memory=10, swap_loss_args=True,
    grid=(64, 64), latent_grid=(16, 16), periodic_grid=True,
)

ELASTICITY = BenchmarkConfig(
    name="elasticity",
    # reference: train_elasticity.py:56-81 (per-sample point clouds,
    # latent mesh == output mesh, encoder without mesh concat)
    model=ModelConfig(2, 44, 1, 256, 2, 4, 0.02, 0.02, concat_mesh=False),
    metric="euclidean",
    ntrain=1000, ntest=200, batch_size=10, epochs=500, loss_p=2,
)

NACA = BenchmarkConfig(
    name="naca",
    # reference: train_naca.py:68-95 (latent = [::4,::4] slice of the C-grid)
    model=ModelConfig(2, 2, 4, 128, 1, 4, 0.02, 0.02, concat_mesh=False),
    metric="euclidean",
    ntrain=1000, ntest=200, batch_size=20, epochs=500, loss_p=2,
    grid=(221, 51), latent_grid=(56, 13),
)

CYLINDER = BenchmarkConfig(
    name="cylinder",
    # reference: train_cylinder.py:55-91 (one-step residual training,
    # 10-step rollout at eval; 10 pairs per trajectory)
    model=ModelConfig(2, 3, 3, 256, 1, 4, 0.01, 0.01, residual_output=True),
    metric="euclidean",
    ntrain=10000, ntest=1000, batch_size=200, epochs=500, loss_p=2,
    swap_loss_args=True,
)

# --- TF-semantics family (the original paper implementation's experiments,
# reference: tensorflow/*/train.py hyperparameters). Locality values are
# percentiles in [0, 100]; latent resolution can equal the query resolution.
BURGERS_TF = BenchmarkConfig(
    name="burgers_tf",
    # reference: tensorflow/1_InviscidBurgers/train.py:14-38
    model=ModelConfig(1, 1, 1, 64, 2, 4, en_loc=1.0, de_loc=8.0),
    metric="periodic1d",
    ntrain=950, ntest=128, batch_size=5, epochs=500, loss_p=1,
    eval_batch_size=128,
    grid=(1024,), latent_grid=(1024,), periodic_grid=True,
)

DARCY_TF = BenchmarkConfig(
    name="darcy_tf",
    # reference: tensorflow/3_Darcy2D/train.py:14-27 (hid 128, ltt 32^2,
    # loc en 2 / de 5; trained checkpoints also exist at 43^2 — the
    # resolution evaluate.py rebuilds before the 421^2 ZSSR transplant)
    model=ModelConfig(2, 1, 1, 128, 2, 4, en_loc=2.0, de_loc=5.0),
    metric="euclidean",
    ntrain=1024, ntest=100, batch_size=8, epochs=500, loss_p=2,
    normalize_x=True, normalize_y=True,
    grid=(43, 43), latent_grid=(32, 32),
)

SOD_TF = BenchmarkConfig(
    name="sod_tf",
    # reference: tensorflow/2_ShockTube/train.py:14-36 (r^2 bandwidth,
    # qry 2048 -> latent 1024, loc 4/2, single output variable)
    model=ModelConfig(1, 3, 1, 64, 2, 4, en_loc=4.0, de_loc=2.0),
    metric="euclidean",
    ntrain=1024, ntest=128, batch_size=8, epochs=500, loss_p=1,
    grid=(2048,), latent_grid=(1024,),
)

VORTICITY_TF = BenchmarkConfig(
    name="vorticity_tf",
    # reference: tensorflow/4_Vorticity/train.py:14-34 (hid 256, 1 head,
    # loc 1/8, 20-step recurrent rollout compiled into the graph — here the
    # rollout is the same lax.scan used by the torch-family config)
    model=ModelConfig(2, 10, 1, 256, 1, en_loc=1.0, de_loc=8.0, n_blocks=4),
    metric="periodic2d",
    ntrain=1000, ntest=200, batch_size=8, epochs=500, loss_p=2,
    rollout_steps=20, trajectory_loss=True, memory=10,
    grid=(64, 64), latent_grid=(16, 16), periodic_grid=True,
)

ELASTICITY_TF = BenchmarkConfig(
    name="elasticity_tf",
    # reference: tensorflow/5_Elasticity/train.py:10-26 (hid 512, 8 heads,
    # loc 2/2, point-cloud model with per-sample distances)
    model=ModelConfig(2, 44, 1, 512, 8, 4, en_loc=2.0, de_loc=2.0,
                      concat_mesh=False),
    metric="euclidean",
    ntrain=1000, ntest=200, batch_size=10, epochs=500, loss_p=2,
)

NACA_TF = BenchmarkConfig(
    name="naca_tf",
    # reference: tensorflow/6_NACA/train.py:14-31 (hid 256, 2 heads,
    # loc 0.5/2, tan(r) bandwidth with NonNeg r, Mach field output,
    # index-space dist^2/2 on the 221x51 C-grid, latent 111x26)
    model=ModelConfig(2, 2, 1, 256, 2, 4, en_loc=0.5, de_loc=2.0),
    metric="euclidean",
    ntrain=1000, ntest=200, batch_size=8, epochs=500, loss_p=2,
    grid=(221, 51), latent_grid=(111, 26),
)

REGISTRY = {
    c.name: c
    for c in (
        BURGERS, SOD, DARCY, VORTICITY, ELASTICITY, NACA, CYLINDER,
        BURGERS_TF, SOD_TF, DARCY_TF, VORTICITY_TF, ELASTICITY_TF, NACA_TF,
    )
}


def get(name: str) -> BenchmarkConfig:
    try:
        return REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown benchmark {name!r}; available: {sorted(REGISTRY)}"
        ) from None


def register(cfg: BenchmarkConfig, overwrite: bool = False) -> BenchmarkConfig:
    """Register a user-defined benchmark configuration.

    The reference has no extension point — adding a PDE means writing a new
    driver script. Here a registered config participates in every entry
    point (train/evaluate/infer/serve/describe, ``--set`` overrides,
    ``--mesh`` parallelism) exactly like the built-in thirteen. Pair with
    :func:`train.benchmarks.register_setup` (or use the one-call
    ``position_induced_transformer_tpu.register_benchmark``).
    """
    if not isinstance(cfg, BenchmarkConfig):
        raise TypeError(f"expected a BenchmarkConfig, got {type(cfg).__name__}")
    if not cfg.name:
        raise ValueError("benchmark config needs a non-empty name")
    if cfg.name in REGISTRY and not overwrite:
        raise ValueError(
            f"benchmark {cfg.name!r} is already registered; pass "
            "overwrite=True to replace it"
        )
    REGISTRY[cfg.name] = cfg
    return cfg


def apply_overrides(cfg: BenchmarkConfig, overrides) -> BenchmarkConfig:
    """Apply ``key=value`` hyperparameter overrides to a config.

    The reference hard-codes every hyperparameter as a module constant
    (train_burgers.py:51-57); this is the framework's no-code-edit knob:
    dotted paths reach the nested model config (``model.hid_dim=128``),
    values are parsed by the FIELD's declared type (ints, floats, bools
    as true/false/1/0, and comma-separated ints for tuple fields like
    ``grid=64`` or ``latent_grid=16,16``). Unknown keys list the valid
    names. Exposed as ``--set`` on the train/evaluate/describe CLIs.
    """

    def parse(value: str, ftype) -> object:
        s = str(ftype)
        if ftype is bool or "bool" in s:
            low = value.strip().lower()
            if low in ("true", "1", "yes"):
                return True
            if low in ("false", "0", "no"):
                return False
            raise ValueError(f"expected a boolean, got {value!r}")
        if ftype is int or s in ("int", "<class 'int'>"):
            return int(value)
        if ftype is float or "float" in s:
            return float(value)
        if "Tuple" in s or "tuple" in s:
            parts = [p for p in value.split(",") if p.strip() != ""]
            elem = float if "float" in s else int
            return tuple(elem(p) for p in parts)
        if "int" in s:  # Optional[int]
            return int(value)
        return value  # str fields (metric, name, model_variant)

    for item in overrides or ():
        key, sep, value = str(item).partition("=")
        if not sep:
            raise ValueError(
                f"bad override {item!r}; expected key=value "
                "(e.g. model.hid_dim=128, lr=3e-4, latent_grid=16,16)"
            )
        key = key.strip()
        target, attr = cfg, key
        if key.startswith("model."):
            target, attr = cfg.model, key[len("model."):]
        fields = {f.name: f for f in dataclasses.fields(target)}
        if attr not in fields:
            scope = "model." if target is not cfg else ""
            raise ValueError(
                f"unknown config field {key!r}; valid: "
                f"{sorted(scope + n for n in fields)}"
            )
        parsed = parse(value, fields[attr].type)
        if target is cfg:
            cfg = dataclasses.replace(cfg, **{attr: parsed})
        else:
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, **{attr: parsed})
            )
    return cfg
