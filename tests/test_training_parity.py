"""Training-dynamics parity: N full optimizer steps vs the torch reference.

Transplants identical initial weights, runs the same batches through both
frameworks' complete training step (forward -> rel-Lp loss -> backward ->
Adam -> per-batch cosine LR), and compares parameters and losses. This
pins down loss conventions, gradient correctness, Adam hyperparameters and
the scheduler stepping — the pieces that determine whether final benchmark
errors can match the reference within tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from position_induced_transformer_tpu.models import PiT, build_geometry
from position_induced_transformer_tpu.train.loop import (
    Task,
    TrainState,
    make_optimizer,
)
from position_induced_transformer_tpu.utils.torch_compat import (
    torch_state_dict_to_flax,
)

from reference_oracle import load_reference

REF = load_reference()
needs_ref = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


@needs_ref
def test_training_steps_match_torch_exactly():
    import torch

    ref_pit, ref_utils = REF
    rng = np.random.default_rng(0)
    L, L_ltt, B, steps = 48, 12, 4, 5
    lr, total_steps = 1e-3, 20
    mesh = np.linspace(0, 1, L + 1)[:-1].reshape(-1, 1).astype(np.float32)
    mesh_ltt = (
        np.linspace(0, 1, L_ltt + 1)[:-1].reshape(-1, 1).astype(np.float32)
    )
    xs = rng.random((steps, B, L, 1)).astype(np.float32)
    ys = rng.random((steps, B, L, 1)).astype(np.float32)

    class RefModel(ref_pit.pit_periodic1d):
        def forward(self, mesh_in, func_in, mesh_out):
            func_in = torch.cat(
                (mesh_in.unsqueeze(0).expand(func_in.shape[0], -1, -1), func_in),
                -1,
            )
            f = self.encoder(mesh_in, func_in, self.mesh_ltt)
            f = self.processor(f, self.mesh_ltt)
            return self.decoder(self.mesh_ltt, f, mesh_out)

    tmod = RefModel(
        space_dim=1, in_dim=1, out_dim=1, hid_dim=16, n_head=2, n_blocks=2,
        mesh_ltt=torch.from_numpy(mesh_ltt), en_loc=0.3, de_loc=0.3,
    )
    init_state_dict = {
        k: v.detach().clone().numpy() for k, v in tmod.state_dict().items()
    }

    opt = torch.optim.Adam(tmod.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=total_steps)
    loss_fn = ref_utils.RelLpNorm(out_dim=1, p=1)
    tm = torch.from_numpy(mesh)
    torch_losses = []
    for t in range(steps):
        opt.zero_grad()
        out = tmod(tm, torch.from_numpy(xs[t]), tm)
        loss = loss_fn(torch.from_numpy(ys[t]), out)
        loss.backward()
        opt.step()
        sched.step()
        torch_losses.append(float(loss))
    torch_params = {
        k: v.detach().numpy() for k, v in tmod.state_dict().items()
    }

    # ---- jax side from the SAME initial weights
    model = PiT(
        space_dim=1, in_dim=1, out_dim=1, hid_dim=16, n_head=2, n_blocks=2,
        en_loc=0.3, de_loc=0.3, concat_mesh=True,
    )
    geom = build_geometry(
        jnp.asarray(mesh), jnp.asarray(mesh_ltt), jnp.asarray(mesh),
        metric="periodic1d", en_loc=0.3, de_loc=0.3,
    )
    params = torch_state_dict_to_flax(init_state_dict)
    optimizer = make_optimizer(lr, total_steps)
    task = Task(model=model, loss_p=1, out_dim=1)
    state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def step(state, x, y):
        loss, grads = jax.value_and_grad(task.loss_fn)(
            state.params, geom, {"x": x, "y": y}
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        return TrainState(new_params, opt_state, state.step + 1), loss

    jax_losses = []
    for t in range(steps):
        state, loss = step(state, jnp.asarray(xs[t]), jnp.asarray(ys[t]))
        jax_losses.append(float(loss))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4)
    ours = torch_state_dict_to_flax(torch_params)
    flat_jax = jax.tree_util.tree_leaves_with_path(state.params)
    flat_ref = jax.tree_util.tree_leaves_with_path(ours)
    ref_by_path = {jax.tree_util.keystr(p): v for p, v in flat_ref}
    assert len(flat_jax) == len(flat_ref)
    for path, a in flat_jax:
        b = ref_by_path[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )
