"""End-to-end walkthrough: train -> evaluate -> ZSSR -> deploy.

Runs in ~2 minutes on CPU with shrunken shapes (pass --full for the real
Darcy configuration). Each stage uses the same public API the CLI wraps,
so this doubles as living documentation of the library surface:

1.  train a Darcy model at a coarse resolution (synthetic data),
2.  evaluate the checkpoint on the test split,
3.  zero-shot super-resolve: re-bind the SAME parameters to a finer mesh
    (the params are resolution-independent — no retraining, the
    reference's headline capability, train_darcy.py:151-180),
4.  deployment inference on a user-supplied .npy batch of RAW inputs,
5.  serve the checkpoint over HTTP and issue a request against it.

Usage:  python examples/full_workflow.py [--full]
"""

import argparse
import dataclasses
import io
import json
import os
import sys
import tempfile
import threading
import urllib.request

import numpy as np

# runnable from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="real Darcy config (slower; TPU recommended)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform, e.g. 'cpu'")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.expanduser("~"), ".cache", "pit-jax"),
    )

    from position_induced_transformer_tpu import configs
    from position_induced_transformer_tpu.train import evaluate, runner

    cfg = configs.DARCY
    setup = {}
    if not args.full:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, hid_dim=16, n_blocks=2),
            latent_grid=(8, 8), batch_size=8,
        )
        setup = {"downsampling": 30}  # 15x15 training grid

    with tempfile.TemporaryDirectory() as tmp:
        ckpt = os.path.join(tmp, "ckpt")

        # 1. train ----------------------------------------------------
        print("== train ==")
        problem, state, history = runner.train(
            cfg,
            epochs=cfg.epochs if args.full else 3,
            ntrain=None if args.full else 64,
            ntest=None if args.full else 16,
            checkpoint_path=ckpt,
            setup_kwargs=setup,
            verbose=True,
        )
        print(f"final train loss: {history[-1]['train_loss']:.4f}")

        # 2. evaluate -------------------------------------------------
        print("== evaluate ==")
        res = evaluate.evaluate(
            cfg, checkpoint_path=ckpt,
            ntest=None if args.full else 16, setup_kwargs=setup,
            # operator-learning probe: error with the input functions
            # shuffled across samples should inflate well above the true
            # pairing once the model has learned the operator
            shuffle_ablation=True,
        )
        print(json.dumps({k: res[k] for k in ("rel_l1", "rel_l2", "rel_max")}))
        print("shuffle ablation:", json.dumps(res["shuffle_ablation"]))

        # 3. zero-shot super-resolution ------------------------------
        # same params, finer mesh: the checkpoint's training-resolution
        # normalizer statistics are bilinearly resized internally
        print("== ZSSR ==")
        zssr = evaluate.evaluate(
            cfg, checkpoint_path=ckpt, zssr=True,
            # --full evaluates at the true 421^2; the quick path at an
            # intermediate 43^2 mesh (downsampling 10)
            zssr_downsampling=1 if args.full else 10,
            ntest=None if args.full else 8,
        )
        print(f"rel_l2 at {'421^2' if args.full else '43^2'} "
              f"(trained coarser): {zssr['rel_l2']:.4f}")

        # 4. deployment inference on RAW user inputs ------------------
        print("== infer ==")
        s = problem.extras["s"]
        raw = np.asarray(
            problem.x_normalizer.denormalize(
                np.asarray(problem.test_data["x"])[:5].reshape(-1, s, s, 1)
            )
        )  # (5, s, s, 1) raw permeability fields
        inp = os.path.join(tmp, "fields.npy")
        np.save(inp, raw)
        out = os.path.join(tmp, "pred.npy")
        info = evaluate.infer(
            cfg, checkpoint_path=ckpt, input_path=inp, output_path=out,
            setup_kwargs=setup,
        )
        print(json.dumps(info))

        # 5. serve over HTTP ------------------------------------------
        print("== serve ==")
        from position_induced_transformer_tpu.train.serve import make_server

        server = make_server(
            cfg, ckpt, host="127.0.0.1", port=0, verbose=False,
            setup_kwargs=setup,
        )
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{server.server_address[1]}"
        buf = io.BytesIO()
        np.save(buf, raw)
        req = urllib.request.Request(
            base + "/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            served = np.load(io.BytesIO(r.read()))
        server.shutdown()
        server.server_close()
        np.testing.assert_allclose(served, np.load(out), rtol=1e-5, atol=1e-6)
        print(f"served predictions {served.shape} == infer output; done.")


if __name__ == "__main__":
    main()
