"""position_induced_transformer_tpu — a TPU-native operator-learning framework.

A from-scratch JAX/XLA/Pallas re-design of the Position-induced Transformer
(PiT, Chen & Wu, ICML 2024) reference implementation
(junfeng-chen/position_induced_transformer). The compute path is pure JAX
(jit/pjit + Pallas kernels); distances, locality masks and attention are
designed around static shapes, precomputed mesh geometry, and MXU-friendly
contractions rather than a translation of the reference's torch modules.

Public surface (capability parity with the reference — see SURVEY.md §2):

- ``ops``      : position-attention primitive, distance metrics, locality
                 masking, metrics/losses, normalizers.
- ``models``   : PiT (torch-semantics), PiT-TF (TF-semantics) and baseline
                 transformer models, as flax.linen modules.
- ``kernels``  : fused Pallas TPU kernels for position attention.
- ``data``     : .mat/.npy/CSV loaders + synthetic per-PDE generators.
- ``train``    : unified jitted training loop, losses, checkpointing, rollout.
- ``parallel`` : device-mesh / sharding presets (DP, sequence-/head-parallel).
- ``configs``  : the 7 reference benchmark configurations.
"""

__version__ = "0.1.0"

from position_induced_transformer_tpu import ops  # noqa: F401


def register_benchmark(cfg, setup_fn, overwrite: bool = False):
    """Register a user-defined benchmark: config + setup in one call.

    After registration the benchmark is a first-class citizen of every
    entry point — ``runner.train(name)``, the train/evaluate/infer/serve
    CLIs (load the defining module with ``--problem-module``), ``--set``
    hyperparameter overrides, and ``--mesh`` parallelism. The reference
    has no extension mechanism (each PDE is a hand-written driver
    script); see examples/custom_problem.py for a complete example.
    """
    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import benchmarks

    had_config = getattr(cfg, "name", None) in configs.REGISTRY
    configs.register(cfg, overwrite=overwrite)
    try:
        benchmarks.register_setup(cfg.name, setup_fn, overwrite=overwrite)
    except BaseException:
        if not had_config:  # atomic: don't leave a config without a setup
            configs.REGISTRY.pop(cfg.name, None)
        raise
    return cfg
