"""Device-mesh sharding presets: the framework's distributed layer.

The reference is strictly single-GPU (SURVEY.md §2.4: no DP/TP/SP, no
comm backend). Here multi-chip scaling is first-class and TPU-idiomatic:
a ``jax.sharding.Mesh`` with ``('data', 'model')`` axes, ``NamedSharding``
annotations on inputs/params, and XLA GSPMD inserting the collectives
(gradient psum over 'data', MLP all-reduce over 'model') on ICI.

Strategies provided:

- **Data parallel**: batch axis sharded over 'data'; params replicated;
  the backward-pass gradient all-reduce is inserted by XLA.
- **Tensor parallel (MLP + heads)**: the two-layer MLPs are column- then
  row-parallel over 'model' (mlp1 kernel split on its output features,
  mlp2 on its input features -> one psum per MLP); position-attention
  bandwidths (n_head, 1, 1) are sharded over 'model' when n_head divides
  the axis, making heads embarrassingly parallel.
- **Sequence parallel** (for ZSSR-scale decoding): shard the output-mesh
  row axis of the decoder cross-attention — each device computes the
  attention rows for its slab of query points against the (small,
  replicated) latent cloud; no ring pass is needed because K/V side is the
  latent bottleneck (SURVEY.md §5 long-context).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_dcn: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') — or, with ``n_dcn > 1``, a
    ('dcn', 'data', 'model') — mesh from the available devices.

    The 'dcn' axis is the multi-slice outer data-parallel axis: its
    gradient all-reduce crosses the data-center network once per step
    while 'data'/'model' collectives stay on ICI (SURVEY.md §5
    "Distributed comm"; the scaling-book multi-slice recipe). On real
    multi-slice hardware the device order groups each slice contiguously
    (``mesh_utils.create_hybrid_device_mesh``); on a single slice — or
    the fake CPU mesh — a plain reshape gives the same program with every
    collective on the one interconnect.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = max(1, n // (n_model * n_dcn))
    want = n_dcn * n_data * n_model
    if n < want:
        raise ValueError(
            f"mesh dcn={n_dcn},data={n_data},model={n_model} needs "
            f"{want} devices but only {n} are available"
        )
    if n_dcn > 1:
        by_slice: dict = {}
        for d in devices:
            by_slice.setdefault(getattr(d, "slice_index", 0), []).append(d)
        if len(by_slice) > 1:
            # real multi-slice hardware: take n_data*n_model devices from
            # EACH of n_dcn slices — selecting devices[:want] instead
            # could land the whole 'dcn' axis inside one slice (or split
            # slices unevenly), silently losing cross-slice parallelism
            per = n_data * n_model
            slices = sorted(by_slice)
            if len(slices) < n_dcn:
                raise ValueError(
                    f"mesh dcn={n_dcn} needs {n_dcn} slices but the "
                    f"devices span only {len(slices)}"
                )
            chosen = []
            for s in slices[:n_dcn]:
                if len(by_slice[s]) < per:
                    raise ValueError(
                        f"mesh dcn={n_dcn},data={n_data},model={n_model} "
                        f"needs {per} devices per slice but slice {s} "
                        f"has {len(by_slice[s])}"
                    )
                chosen.extend(by_slice[s][:per])
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, n_data, n_model),
                dcn_mesh_shape=(n_dcn, 1, 1),
                devices=chosen,
            )
        else:
            arr = np.array(devices[:want]).reshape(n_dcn, n_data, n_model)
        return Mesh(arr, ("dcn", "data", "model"))
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def parse_mesh_spec(spec: "Mesh | str | None") -> Optional[Mesh]:
    """Resolve the runner/CLI ``--mesh`` argument to a device mesh.

    Accepted forms: an existing :class:`Mesh` (returned as-is), ``None``
    (single device — no mesh), ``'auto'`` (all visible devices
    data-parallel), ``'data=N[,model=M]'`` optionally with ``dcn=K``
    (multi-slice: K-way outer data parallelism whose all-reduce crosses
    DCN — see :func:`make_mesh`), or ``'stage=K'`` (GPipe pipeline
    parallelism over the processor blocks — parallel/pipeline.py;
    exclusive of the other axes because the pipeline schedule is a
    shard_map over its own 1-D mesh). The reference is strictly
    single-device (SURVEY.md §2.4); this is the production entry point
    for the framework's DP/TP/PP presets.
    """
    if spec is None or isinstance(spec, Mesh):
        return spec
    s = str(spec).strip().lower()
    if s in ("", "none", "1"):
        return None
    if s == "auto":
        devices = jax.devices()
        n = len(devices)
        if n <= 1:
            return None
        slices = {getattr(d, "slice_index", 0) for d in devices}
        if len(slices) > 1 and n % len(slices) == 0:
            # multi-slice hardware: stage the all-reduce (ICI within each
            # slice, one DCN hop across) instead of a flat 'data' axis
            # whose every all-reduce naively crosses DCN
            return make_mesh(
                n_data=n // len(slices), n_model=1, n_dcn=len(slices)
            )
        return make_mesh(n_data=n, n_model=1)
    n_data, n_model, n_stage, n_dcn = 1, 1, 0, 1
    seen = set()
    for part in s.split(","):
        key, sep, val = part.partition("=")
        key, val = key.strip(), val.strip()
        if not sep or not val.isdigit() or int(val) < 1:
            raise ValueError(
                f"bad mesh spec {spec!r}: expected 'auto', "
                "'data=N[,model=M]', 'dcn=K,data=N[,model=M]' or "
                "'stage=K' with positive integers"
            )
        if key in seen:
            raise ValueError(
                f"duplicate mesh axis {key!r} in {spec!r}"
            )
        seen.add(key)
        if key == "data":
            n_data = int(val)
        elif key == "model":
            n_model = int(val)
        elif key == "stage":
            n_stage = int(val)
        elif key == "dcn":
            n_dcn = int(val)
        else:
            raise ValueError(
                f"unknown mesh axis {key!r} in {spec!r} "
                "(axes: dcn, data, model, stage)"
            )
    n_avail = len(jax.devices())
    if n_stage:
        if n_data > 1 or n_model > 1 or n_dcn > 1:
            raise ValueError(
                f"mesh {spec!r}: the 'stage' (pipeline) axis cannot be "
                "combined with 'dcn'/'data'/'model' — the GPipe schedule "
                "owns its whole mesh"
            )
        if n_stage > n_avail:
            raise ValueError(
                f"mesh {spec!r} needs {n_stage} devices but only "
                f"{n_avail} are visible"
            )
        devices = np.array(jax.devices()[:n_stage])
        return Mesh(devices, ("stage",))
    if n_dcn * n_data * n_model > n_avail:
        raise ValueError(
            f"mesh {spec!r} needs {n_dcn * n_data * n_model} devices but "
            f"only {n_avail} are visible"
        )
    return make_mesh(n_data=n_data, n_model=n_model, n_dcn=n_dcn)


def data_axis_size(mesh: Optional[Mesh]) -> int:
    """Total batch-sharding ways: the ICI 'data' axis times the
    multi-slice 'dcn' axis (1 for no mesh)."""
    if mesh is None:
        return 1
    return mesh.shape.get("data", 1) * mesh.shape.get("dcn", 1)


def batch_spec(leaf, dcn: bool = False) -> P:
    """Shard the leading (batch) axis over 'data' (and, on a multi-slice
    mesh, the outer 'dcn' axis), replicate the rest."""
    axes = ("dcn", "data") if dcn else "data"
    return P(axes, *([None] * (leaf.ndim - 1)))


def shard_batch(mesh: Mesh, batch):
    """Sharding constraint pytree for a batch dict (apply inside jit)."""
    dcn = "dcn" in mesh.shape
    return jax.tree_util.tree_map(
        lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, batch_spec(a, dcn))
        ),
        batch,
    )


def _param_pspec(path, leaf, model_axis_size: int) -> P:
    """Tensor-parallel PartitionSpec for a PiT parameter leaf.

    Bandwidths (``lmda``, shaped (n_head, 1, 1)) shard over 'model' only
    when the head count divides the axis — replicating them costs
    nothing. MLP kernels/biases MUST divide evenly: a silent fallback
    would quietly lose tensor parallelism, and an unguarded device_put
    dies with an opaque uneven-shard error — so mismatches raise with
    the leaf path."""
    keys = [getattr(k, "key", str(k)) for k in path]
    if model_axis_size <= 1:
        return P()
    name = keys[-1]
    if name == "lmda" and leaf.shape[0] % model_axis_size == 0:
        return P("model", None, None)

    def check(dim: int, what: str):
        if dim % model_axis_size:
            raise ValueError(
                f"tensor parallelism: {what} ({dim}) at "
                f"{'/'.join(keys)} is not divisible by the 'model' axis "
                f"size {model_axis_size} — choose a model axis that "
                "divides hid_dim"
            )

    if "mlp1" in keys and name == "kernel":
        check(leaf.shape[1], "mlp1 output features")
        return P(None, "model")  # column parallel
    if "mlp1" in keys and name == "bias":
        check(leaf.shape[0], "mlp1 bias features")
        return P("model")
    if "mlp2" in keys and name == "kernel":
        check(leaf.shape[0], "mlp2 input features")
        return P("model", None)  # row parallel (psum after)
    return P()


def param_shardings(mesh: Mesh, params, n_head: int = None):
    """NamedSharding pytree for a PiT parameter tree (TP over 'model').

    ``n_head`` is accepted for backward compatibility and unused: the
    head-sharding gate reads the bandwidth leaf's own shape."""
    del n_head
    model_size = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _param_pspec(path, leaf, model_size)
        ),
        params,
    )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, state, n_head: int = None):
    """Place a TrainState: params and Adam moments TP-sharded over 'model',
    scalars replicated. Works because optimizer-moment leaf paths embed the
    corresponding parameter path (optax mirrors the param treedef), so the
    same spec rule applies. ``n_head`` is accepted for backward
    compatibility and unused (see :func:`param_shardings`)."""
    del n_head
    model_size = mesh.shape.get("model", 1)

    def place(path, leaf):
        leaf = jax.numpy.asarray(leaf)
        spec = (
            _param_pspec(path, leaf, model_size)
            if leaf.ndim > 0
            else P()
        )
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return type(state)(
        jax.tree_util.tree_map_with_path(place, state.params),
        jax.tree_util.tree_map_with_path(place, state.opt_state),
        jax.device_put(state.step, replicated(mesh)),
    )


def replicate_tree(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, replicated(mesh)), tree
    )


def sequence_shard_geometry(mesh: Mesh, geom, axis: str = "data", pad: bool = False):
    """Shard the decoder's query rows over a mesh axis (sequence
    parallelism for ZSSR-scale decode). For the torch-family
    :class:`~..models.geometry.Geometry` the ``dist_up``/``thr_up`` rows
    are distributed; for the TF-family ``TFGeometry`` the ``m_cross``/
    ``thr_up`` rows (decoder cross-attention). Everything else stays
    replicated.

    ``pad=True`` pads the query-row axis to a multiple of the axis size by
    repeating the last row (needed e.g. for the 421^2 = 177,241-row Darcy
    decode, which no power-of-two axis divides); model outputs then carry
    the same padded rows — slice them off with the original row count
    (e.g. ``geom.dist_up.shape[0]`` before the call).

    Places the WHOLE geometry: the non-row fields are replicated here, so
    pass the host-built geometry directly — replicating it beforehand
    would upload the ~173 MB ``dist_up`` to every device only to
    immediately re-place it at 1/N rows."""
    import jax.numpy as jnp

    size = mesh.shape[axis]

    def row_pad(a):
        if a is None or not pad:
            return a
        rem = a.shape[0] % size
        if rem == 0:
            return a
        reps = jnp.repeat(a[-1:], size - rem, axis=0)
        return jnp.concatenate([a, reps], axis=0)

    def row_shard(a):
        if a is None:
            return None
        return jax.device_put(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
        )

    if hasattr(geom, "m_cross"):  # TFGeometry (NamedTuple)
        raise ValueError(
            "sequence_shard_geometry handles torch-family Geometry; for a "
            "TFGeometry use sequence_constrain_tf_geometry inside the "
            "jitted forward (its m_cross is consumed transposed by the "
            "encoder, so rows cannot be padded, and device_put rejects "
            "uneven shards)"
        )
    if geom.dist_up is None:
        raise ValueError(
            "sequence_shard_geometry needs a materialized decoder "
            "distance matrix (geom.dist_up); this geometry is lazy "
            "(raw per-sample coordinates) — returning it unchanged "
            "would silently decode ALL rows on every device"
        )

    import dataclasses

    rows_dist, rows_thr = geom.dist_up, geom.thr_up
    rest = dataclasses.replace(geom, dist_up=None, thr_up=None)
    rest = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, replicated(mesh)), rest
    )
    return dataclasses.replace(
        rest,
        dist_up=row_shard(row_pad(rows_dist)),
        thr_up=row_shard(row_pad(rows_thr)),
    )


def sequence_constrain_tf_geometry(mesh: Mesh, geom, axis: str = "data"):
    """Sequence-parallel decode constraints for a TF-family ``TFGeometry``,
    to be applied INSIDE a jitted forward: the decoder cross-attention rows
    (``m_cross``/``thr_up``) get a ``with_sharding_constraint`` over the
    mesh axis. Unlike :func:`sequence_shard_geometry` this never pads —
    GSPMD carries the uneven final shard (e.g. 177,241 = 421^2 query rows
    on 8 devices), which also keeps ``m_cross.T`` (consumed by the encoder)
    shape-consistent."""
    spec = lambda a: NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))
    wsc = lambda a: (
        None if a is None else jax.lax.with_sharding_constraint(a, spec(a))
    )
    return geom._replace(
        m_cross=wsc(geom.m_cross), thr_up=wsc(geom.thr_up)
    )
