"""Independent numpy oracle for the TF-semantics PiT family.

Hand-ported, line by line, from the reference TensorFlow implementation —
NOT from this repo's jax code — so the PiTTF/PiTTFPointCloud modules are
pinned against an independently-derived ground truth with shared weights
(the same standard the torch family meets via the installed torch package,
tests/reference_oracle.py). TensorFlow itself is not installed here, so
this transcription of the reference source is the executable stand-in:

- ``MultiHeadPosAtt``: reference tensorflow/1_InviscidBurgers/utils.py:87-146
  (tan-sin bandwidth), 2_ShockTube/utils.py:117-135 (r^2),
  6_NACA/utils.py:114-132 (tan(r), NonNeg weight constraint).
- ``PiT.call``: 1_InviscidBurgers/utils.py:148-228 (with the up2 decoder
  self-attention + MLP/W additive residual of the 1-D dirs);
  3_Darcy2D/utils.py:181-262 and 6_NACA's variant drop up2.
- Point-cloud ``MultiHeadPosAtt``/``PiT``: 5_Elasticity/utils.py:61-188
  (batched per-sample distances dist^2/2 from the first two input
  channels, r^2 bandwidth, MLP/W residuals at encoder and decoder too).

Everything is computed in float64 so the oracle is strictly more precise
than the float32 module under test; keras' default GELU is exact erf
(approximate=False), and ``tfp.stats.percentile(..., 'linear')`` is
numpy's default linear-interpolation percentile.
"""

from __future__ import annotations

import math

import numpy as np

F32_MAX = float(np.finfo(np.float32).max)


def gelu(x):
    """Exact (erf) GELU — keras' default."""
    from scipy.special import erf

    return 0.5 * x * (1.0 + erf(x / math.sqrt(2.0)))


def dense(p, x):
    return x @ np.asarray(p["kernel"], np.float64) + np.asarray(
        p["bias"], np.float64
    )


def tf_mlp(p, x):
    """Dense(gelu) -> Dense (reference utils.py `mlp`, :63-86)."""
    return dense(p["mlp2"], gelu(dense(p["mlp1"], x)))


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def bandwidth_scale(r, kind):
    if kind == "tan_sin":
        # reference: tensorflow/1_InviscidBurgers/utils.py:123
        return np.tan(0.25 * np.pi * (1 - 1e-7) * (1.0 + np.sin(r)))
    if kind == "square":
        # reference: tensorflow/2_ShockTube/utils.py:118
        return r * r
    if kind == "tan":
        # reference: tensorflow/6_NACA/utils.py:115 (r constrained NonNeg
        # by keras after each update; the forward itself is plain tan)
        return np.tan(r)
    raise ValueError(kind)


def pos_att(p, dist, locality, x, bandwidth="tan_sin"):
    """Fixed-mesh MultiHeadPosAtt forward
    (reference: tensorflow/1_InviscidBurgers/utils.py:117-139).

    p: {'band_width': (H,1,1), 'weight': (H, in, v_dim)};
    dist: (L_out, L_in) — already transposed for the encoder's `down`;
    x: (B, L_in, in). Returns (B, L_out, H*v_dim).
    """
    r = np.asarray(p["band_width"], np.float64)
    w = np.asarray(p["weight"], np.float64)
    H, v_dim = w.shape[0], w.shape[2]
    scaled = np.asarray(dist, np.float64)[None] * bandwidth_scale(
        r, bandwidth
    )  # (H, L_out, L_in)
    if locality <= 100:
        mask = np.percentile(
            scaled, locality, axis=-1, keepdims=True, method="linear"
        )
        scaled = np.where(scaled <= mask, scaled, F32_MAX)
    att = softmax(-scaled, axis=-1)  # (H, L_out, L_in)
    value = np.einsum("bnj,hjk->bhnk", np.asarray(x, np.float64), w)
    out = np.einsum("hnj,bhjd->bhnd", att, value)  # (B, H, L_out, v)
    out = np.transpose(out, (0, 2, 1, 3)).reshape(
        x.shape[0], -1, H * v_dim
    )
    return gelu(out)


def pit_tf_forward(
    params,
    m_qry,
    m_cross,
    m_ltt,
    mesh,
    x,
    locality_encoder,
    locality_decoder,
    n_blocks=4,
    bandwidth="tan_sin",
    use_decoder_selfatt=True,
):
    """Reference TF PiT.call (tensorflow/1_InviscidBurgers/utils.py:198-218;
    the no-up2 form is 3_Darcy2D/utils.py:223-244 minus its in-call
    denormalization). ``mesh``: (L_qry, space_dim) grid concatenated to the
    input (get_mesh, utils.py:220-223)."""
    x = np.asarray(x, np.float64)
    grid = np.broadcast_to(
        np.asarray(mesh, np.float64)[None], (x.shape[0],) + mesh.shape
    )
    en = np.concatenate([grid, x], axis=-1)
    en = gelu(dense(params["en_layer"], en))
    h = pos_att(
        params["down"], np.asarray(m_cross).T, locality_encoder, en, bandwidth
    )
    for i in range(n_blocks):
        pa = pos_att(params[f"MHPA_{i}"], m_ltt, 200.0, h, bandwidth)
        h = tf_mlp(params[f"MLP_{i}"], pa) + dense(params[f"W_{i}"], h)
        h = gelu(h)
    de = pos_att(params["up"], m_cross, locality_decoder, h, bandwidth)
    if use_decoder_selfatt:
        de2 = pos_att(params["up2"], m_qry, locality_decoder, de, bandwidth)
        de = tf_mlp(params["mlp"], de2) + dense(params["w"], de)
        de = gelu(de)
    return tf_mlp(params["de_layer"], de)


def pos_att_batched(p, dist_b, locality, x):
    """Point-cloud MultiHeadPosAtt forward with per-sample distances and
    r^2 bandwidth (reference: tensorflow/5_Elasticity/utils.py:86-103).

    p: {'band_width': (1,H,1,1), 'weight': (H, in, v)}; dist_b: (B, L, L).
    """
    r = np.asarray(p["band_width"], np.float64)
    w = np.asarray(p["weight"], np.float64)
    H, v_dim = w.shape[0], w.shape[2]
    scaled = np.asarray(dist_b, np.float64)[:, None] * (r * r)  # (B,H,L,L)
    if locality <= 100:
        mask = np.percentile(
            scaled, locality, axis=-1, keepdims=True, method="linear"
        )
        scaled = np.where(scaled <= mask, scaled, F32_MAX)
    att = softmax(-scaled, axis=-1)
    value = np.einsum("bnj,hjk->bhnk", np.asarray(x, np.float64), w)
    out = np.einsum("bhnj,bhjd->bhnd", att, value)
    out = np.transpose(out, (0, 2, 1, 3)).reshape(x.shape[0], -1, H * v_dim)
    return gelu(out)


def pit_tf_point_cloud_forward(
    params, x, locality_encoder, locality_decoder, n_blocks=4
):
    """Reference point-cloud PiT.call (tensorflow/5_Elasticity/utils.py:
    155-176): per-sample dist^2/2 from the first two input channels,
    MLP/W additive residuals at encoder, processor blocks and decoder."""
    x = np.asarray(x, np.float64)
    coords = x[..., :2]
    diff = coords[:, :, None, :] - coords[:, None, :, :]
    m_dist = np.sum(diff * diff, axis=-1) / 2.0  # (B, L, L)

    en = gelu(dense(params["en_layer"], x))
    h = tf_mlp(
        params["mlp1"],
        pos_att_batched(params["down"], m_dist, locality_encoder, en),
    ) + dense(params["w1"], en)
    h = gelu(h)
    for i in range(n_blocks):
        pa = pos_att_batched(params[f"PA_{i}"], m_dist, 200.0, h)
        h = tf_mlp(params[f"MLP_{i}"], pa) + dense(params[f"W_{i}"], h)
        h = gelu(h)
    de = tf_mlp(
        params["mlp2"],
        pos_att_batched(params["up"], m_dist, locality_decoder, h),
    ) + dense(params["w2"], h)
    de = gelu(de)
    return tf_mlp(params["de_layer"], de)


def rel_norm_loss(true, pred, p=1):
    """The keras ``rel_norm`` training loss: per-sample relative Lp of the
    flattened fields, MEAN over the batch (reference:
    tensorflow/1_InviscidBurgers/utils.py:12-25 reduce_mean)."""
    t = np.asarray(true, np.float64).reshape(true.shape[0], -1)
    q = np.asarray(pred, np.float64).reshape(pred.shape[0], -1)
    if p == 1:
        rel = np.sum(np.abs(t - q), axis=1) / np.sum(np.abs(t), axis=1)
    else:
        rel = np.linalg.norm(t - q, axis=1) / np.linalg.norm(t, axis=1)
    return float(np.mean(rel))


def cosine_decay(lr, step, decay_steps, alpha=0.0):
    """keras ``CosineDecay(lr, decay_steps)`` (reference:
    tensorflow/1_InviscidBurgers/train.py:48): evaluated at the optimizer's
    PRE-increment iteration count."""
    frac = min(float(step), float(decay_steps)) / float(decay_steps)
    cosine = 0.5 * (1.0 + math.cos(math.pi * frac))
    return lr * ((1.0 - alpha) * cosine + alpha)


def adam_keras_init(params):
    def zeros(t):
        if isinstance(t, dict):
            return {k: zeros(v) for k, v in t.items()}
        return np.zeros_like(np.asarray(t, np.float64))

    return {"t": 0, "m": zeros(params), "v": zeros(params)}


def adam_keras_step(
    params, grads, state, lr, b1=0.9, b2=0.999, eps=1e-7
):
    """One ``tf.keras.optimizers.Adam`` update (TF2 semantics): epsilon is
    added OUTSIDE the bias correction —

        lr_t = lr * sqrt(1 - b2^(t+1)) / (1 - b1^(t+1))
        m    = b1 m + (1-b1) g ;  v = b2 v + (1-b2) g^2
        p   -= lr_t * m / (sqrt(v) + eps)

    (torch/optax instead use m_hat/(sqrt(v_hat)+eps).) ``lr`` is the
    already-decayed schedule value at the pre-increment step. Returns the
    updated (params, state); everything float64."""
    t = state["t"] + 1
    lr_t = lr * math.sqrt(1.0 - b2**t) / (1.0 - b1**t)

    def walk(p, g, m, v):
        if isinstance(p, dict):
            new_p, new_m, new_v = {}, {}, {}
            for k in p:
                new_p[k], new_m[k], new_v[k] = walk(p[k], g[k], m[k], v[k])
            return new_p, new_m, new_v
        p = np.asarray(p, np.float64)
        g = np.asarray(g, np.float64)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        return p - lr_t * m / (np.sqrt(v) + eps), m, v

    new_params, new_m, new_v = walk(params, grads, state["m"], state["v"])
    return new_params, {"t": t, "m": new_m, "v": new_v}


def nonneg_project(params):
    """keras NonNeg weight-constraint semantics: clamp every band_width to
    [0, inf) after the update (reference: tensorflow/6_NACA/utils.py:115)."""
    def walk(t, under_bw=False):
        if isinstance(t, dict):
            return {
                k: walk(v, under_bw or k == "band_width")
                for k, v in t.items()
            }
        return np.maximum(t, 0.0) if under_bw else t

    return walk(params)


def self_att(p, x):
    """Scaled dot-product MHA with trailing GELU
    (reference: tensorflow/1_InviscidBurgers/utils.py:265-277)."""
    q = np.asarray(p["query"], np.float64)
    k = np.asarray(p["key"], np.float64)
    v = np.asarray(p["value"], np.float64)
    H, v_dim = q.shape[0], q.shape[2]
    x = np.asarray(x, np.float64)
    Q = np.einsum("bnj,hjk->bhnk", x, q)
    K = np.einsum("bnj,hjk->bhnk", x, k)
    att = softmax(
        np.einsum("bhij,bhkj->bhik", Q, K) / v_dim**0.5, axis=-1
    )
    V = np.einsum("bnj,hjk->bhnk", x, v)
    out = np.einsum("bhnj,bhjd->bhnd", att, V)
    out = np.transpose(out, (0, 2, 1, 3)).reshape(x.shape[0], -1, H * v_dim)
    return gelu(out)


def hybrid_att(p, dist, locality, x):
    """SelfMultiHeadPosAtt: logits = QK^T/sqrt(d) - tan(r)*D with
    percentile locality on the scaled distances
    (reference: tensorflow/1_InviscidBurgers/utils.py:462-481; r is
    NonNeg-projected after each UPDATE, so the forward is plain tan)."""
    r = np.asarray(p["band_width"], np.float64)
    q = np.asarray(p["query"], np.float64)
    k = np.asarray(p["key"], np.float64)
    w = np.asarray(p["weight"], np.float64)
    H, v_dim = q.shape[0], q.shape[2]
    x = np.asarray(x, np.float64)
    scaled = np.asarray(dist, np.float64)[None] * np.tan(r)  # (H, L, L)
    if locality <= 100:
        mask = np.percentile(
            scaled, locality, axis=-1, keepdims=True, method="linear"
        )
        scaled = np.where(scaled <= mask, scaled, F32_MAX)
    Q = np.einsum("bnj,hjk->bhnk", x, q)
    K = np.einsum("bnj,hjk->bhnk", x, k)
    V = np.einsum("bnj,hjk->bhnk", x, w)
    logits = np.einsum("bhmi,bhni->bhmn", Q, K) / v_dim**0.5 - scaled[None]
    att = softmax(logits, axis=-1)
    out = np.einsum("bhnj,bhjd->bhnd", att, V)
    out = np.transpose(out, (0, 2, 1, 3)).reshape(x.shape[0], -1, H * v_dim)
    return gelu(out)


def pit_tf_variant_forward(
    params,
    m_qry,
    m_cross,
    m_ltt,
    mesh,
    x,
    locality_encoder,
    locality_decoder,
    variant,
    n_blocks=4,
    bandwidth="tan_sin",
    use_decoder_selfatt=True,
):
    """The reference's ablation baselines — the dir's PiT.call with the
    attention modules swapped (reference:
    tensorflow/1_InviscidBurgers/utils.py:285-353 LiteTransformer
    [processor self-attention], :355-416 Transformer [all self-attention,
    no latent downsampling], :483-553 SelfPiT [hybrid everywhere])."""
    proc, coder = {
        "pit": ("position", "position"),
        "lite": ("self", "position"),
        "transformer": ("self", "self"),
        "selfpit": ("hybrid", "hybrid"),
    }[variant]

    def att(kind, p, dist, locality, h):
        if kind == "position":
            return pos_att(p, dist, locality, h, bandwidth)
        if kind == "self":
            return self_att(p, h)
        return hybrid_att(p, dist, locality, h)

    x = np.asarray(x, np.float64)
    grid = np.broadcast_to(
        np.asarray(mesh, np.float64)[None], (x.shape[0],) + mesh.shape
    )
    en = gelu(dense(params["en_layer"], np.concatenate([grid, x], axis=-1)))
    h = att(
        coder, params["down"],
        None if m_cross is None else np.asarray(m_cross).T,
        locality_encoder, en,
    )
    for i in range(n_blocks):
        pa = att(proc, params[f"MHPA_{i}"], m_ltt, 200.0, h)
        h = gelu(tf_mlp(params[f"MLP_{i}"], pa) + dense(params[f"W_{i}"], h))
    de = att(coder, params["up"], m_cross, locality_decoder, h)
    if use_decoder_selfatt:
        de2 = att(coder, params["up2"], m_qry, locality_decoder, de)
        de = gelu(tf_mlp(params["mlp"], de2) + dense(params["w"], de))
    return tf_mlp(params["de_layer"], de)
