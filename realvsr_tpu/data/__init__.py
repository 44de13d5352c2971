"""Dataset / dataloader factories (rebuild of ``codes/data/__init__.py``).

Same mode strings as the reference plus 'Synthetic' modes for fixtures.
"""
from __future__ import annotations

import jax


def create_dataset(dataset_opt: dict):
    mode = dataset_opt["mode"]
    if mode == "RealVSR":
        from realvsr_tpu.data.realvsr import RealVSRDataset as D
    elif mode == "RealVSR_AllPair":
        from realvsr_tpu.data.realvsr import RealVSRAllPairDataset as D
    elif mode == "Vimeo90K":
        from realvsr_tpu.data.vimeo90k import Vimeo90KDataset as D
    elif mode == "Vimeo90K_AllPair":
        from realvsr_tpu.data.vimeo90k import Vimeo90KAllPairDataset as D
    elif mode == "VideoTest":
        from realvsr_tpu.data.video_test import VideoTestDataset as D
    elif mode == "Synthetic":
        from realvsr_tpu.data.synthetic import SyntheticVSRDataset as D
    elif mode == "SyntheticTest":
        from realvsr_tpu.data.synthetic import SyntheticVideoTestDataset as D
    elif mode == "SyntheticMotion":
        from realvsr_tpu.data.synthetic import SyntheticMotionVSRDataset as D
    elif mode == "SyntheticMotionTest":
        from realvsr_tpu.data.synthetic import (
            SyntheticMotionVideoTestDataset as D)
    else:
        raise NotImplementedError(f"Dataset [{mode}] is not recognized.")
    return D(dataset_opt)


def create_dataloader(dataset, dataset_opt: dict, opt: dict | None = None,
                      sampler=None):
    phase = dataset_opt["phase"]
    if phase == "train":
        from realvsr_tpu.data.loader import TrainLoader

        return TrainLoader(
            dataset,
            batch_size=dataset_opt["batch_size"],
            num_replicas=jax.process_count(),
            rank=jax.process_index(),
            ratio=int(dataset_opt.get("dataset_ratio") or 200),
            num_workers=int(dataset_opt.get("n_workers") or 3),
            seed=int(((opt or {}).get("train") or {}).get("manual_seed") or 0),
        )
    from realvsr_tpu.data.loader import EvalLoader

    return EvalLoader(dataset)
