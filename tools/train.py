#!/usr/bin/env python
"""Training CLI — same interface as the reference ``codes/train.py``:

    python tools/train.py -opt configs/train/<experiment>.yml

Multi-process launch is JAX-native (set JAX_COORDINATOR_ADDRESS etc. or use
a TPU pod runtime); no --launcher flag is needed.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True,
                        help="Path to option YAML file.")
    parser.add_argument("--dcn_impl", type=str, default=None,
                        choices=["columns", "tap_loop", "block", "frame"],
                        help="DCN implementation override. 'frame' = fused "
                             "Pallas kernel with a custom-VJP backward "
                             "(fastest; offsets clamped to ±8 px; enables "
                             "192^2 batch-8/chip training)")
    parser.add_argument("--dcn_max_offset", type=int, default=None,
                        help="±R clamp for the block/frame DCN paths "
                             "(default 8; the clamp-validation run uses 16)")
    parser.add_argument("--platform", type=str, default=None,
                        help="Force a JAX platform (e.g. cpu for smoke runs).")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of steps ~10-15 "
                             "into <experiments_root>/profile (view with "
                             "TensorBoard or xprof).")
    args = parser.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    from realvsr_tpu.core.config import parse
    from realvsr_tpu.train.trainer import Trainer

    if args.dcn_impl:
        from realvsr_tpu.ops.deform_conv import set_default_impl

        set_default_impl(args.dcn_impl, block_max_offset=args.dcn_max_offset)

    opt = parse(args.opt, is_train=True)
    trainer = Trainer(opt)
    if args.profile:
        trainer.profile_steps = (10, 15)
    trainer.train()


if __name__ == "__main__":
    main()
