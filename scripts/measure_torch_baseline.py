"""Measure the torch reference's Burgers train-step throughput on this host.

Imports the upstream implementation read-only from /root/reference (no code
copied) and times forward+backward+Adam+scheduler steps at the exact
train_burgers.py configuration on synthetic data, writing the result to
BASELINE_local.json for bench.py's ``vs_baseline`` ratio.

The reference targets a single CUDA GPU; on this host only CPU torch is
available, so the recorded number is a CPU baseline (stated as such in
BASELINE.md).
"""

import json
import os
import sys
import time

REFERENCE = os.environ.get("PIT_REFERENCE_PATH", "/root/reference")


def main():
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import numpy as np
    import torch

    import pit as ref_pit  # reference module
    import utils as ref_utils

    from position_induced_transformer_tpu.data import synthetic

    x, y = synthetic.burgers(n=256, L=1024)
    x = torch.from_numpy(x)
    y = torch.from_numpy(y)
    mesh = torch.linspace(0, 1, 1025)[:-1].reshape(-1, 1)
    mesh_ltt = torch.linspace(0, 1, 257)[:-1].reshape(-1, 1)

    class BurgersPiT(ref_pit.pit_periodic1d):
        def forward(self, mesh_in, func_in, mesh_out):
            func_in = torch.cat(
                (mesh_in.unsqueeze(0).expand(func_in.shape[0], -1, -1), func_in),
                -1,
            )
            f = self.encoder(mesh_in, func_in, self.mesh_ltt)
            f = self.processor(f, self.mesh_ltt)
            return self.decoder(self.mesh_ltt, f, mesh_out)

    model = BurgersPiT(
        space_dim=1, in_dim=1, out_dim=1, hid_dim=64, n_head=2, n_blocks=5,
        mesh_ltt=mesh_ltt, en_loc=0.02, de_loc=0.02,
    )
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=16000)
    loss_fn = ref_utils.RelLpNorm(out_dim=1, p=1)

    bs = 8
    n_batches = x.shape[0] // bs

    def run_epoch():
        for i in range(n_batches):
            bx, by = x[i * bs : (i + 1) * bs], y[i * bs : (i + 1) * bs]
            opt.zero_grad()
            out = model(mesh, bx, mesh)
            loss = loss_fn(by, out)
            loss.backward()
            opt.step()
            sched.step()
        return float(loss)

    run_epoch()  # warm-up
    n_epochs = 3
    t0 = time.perf_counter()
    for _ in range(n_epochs):
        last = run_epoch()
    dt = time.perf_counter() - t0
    steps_per_sec = n_epochs * n_batches / dt

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "BASELINE_local.json"
    )
    result = {
        "torch_cpu_steps_per_sec": round(steps_per_sec, 3),
        "config": "burgers L=1024 latent=256 hid=64 heads=2 blocks=5 bs=8",
        "torch_version": torch.__version__,
        "device": "cpu",
    }
    with open(os.path.abspath(out_path), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
