#!/usr/bin/env python
"""No-reference inference CLI (counterpart of test_RealVSR_wo_GT.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True)
    parser.add_argument("--dcn_impl", type=str, default=None,
                        choices=["columns", "tap_loop", "block", "frame"],
                        help="DCN implementation override (block = fast, "
                             "offsets clamped to ±8 px)")
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--save_imgs", action="store_true")
    parser.add_argument("--flip_test", action="store_true")
    args = parser.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from realvsr_tpu.core.config import parse
    from realvsr_tpu.eval.test_wo_gt import evaluate_wo_gt
    from realvsr_tpu.models import define_g
    from realvsr_tpu.train import checkpoint as ckpt
    from realvsr_tpu.train.trainer import setup_logger

    if args.dcn_impl:
        from realvsr_tpu.ops.deform_conv import set_default_impl

        set_default_impl(args.dcn_impl)

    opt = parse(args.opt, is_train=False)
    results_root = opt["path"]["results_root"]
    os.makedirs(results_root, exist_ok=True)
    setup_logger(results_root)

    ds = opt["datasets"]["test"]
    model = define_g(opt)
    n_frames = opt["network_G"]["nframes"]
    nc = opt["network_G"].get("nc") or 3
    sample = jnp.zeros((1, n_frames, 64, 64, nc), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample)["params"]
    if opt["path"].get("pretrain_model_G"):
        params = ckpt.load_network(opt["path"]["pretrain_model_G"], params)

    evaluate_wo_gt(
        model, params, lq_root=ds["dataroot_LQ"], n_frames=n_frames,
        color=ds.get("color") or "YCbCr",
        padding=ds.get("padding") or "replicate",
        flip_test=args.flip_test,
        save_folder=results_root if args.save_imgs else None,
    )


if __name__ == "__main__":
    main()
