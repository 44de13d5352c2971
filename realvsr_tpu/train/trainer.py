"""Training orchestration (rebuild of ``codes/train.py``).

Same lifecycle as the reference main(): config → (multi-process init) →
experiment dirs/loggers → datasets → model/state → resume → hot loop
(update lr [inside optax] → feed → jitted train step → periodic log / val /
checkpoint).  The jitted step runs over a data-sharded mesh; validation
PSNR aggregation is a host mean over per-process results (the reference
used dist.reduce, train.py:253-255).
"""
from __future__ import annotations

import logging
import math
import os
import os.path as osp
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.core.config import check_resume, dict2str
from realvsr_tpu.data import create_dataloader, create_dataset
from realvsr_tpu.models import define_g
from realvsr_tpu.ops import metrics as metric_ops
from realvsr_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                       is_main_process,
                                       maybe_initialize_distributed,
                                       shard_batch)
from realvsr_tpu.train import checkpoint as ckpt
from realvsr_tpu.train.state import create_train_state
from realvsr_tpu.train.wrappers import make_eval_step, make_train_step

logger = logging.getLogger("base")


def setup_logger(log_dir: str | None, name: str = "base",
                 level=logging.INFO) -> logging.Logger:
    lg = logging.getLogger(name)
    lg.setLevel(level)
    lg.propagate = False
    if not lg.handlers:
        fmt = logging.Formatter(
            "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
            datefmt="%y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        lg.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(osp.join(log_dir, "train.log"))
            fh.setFormatter(fmt)
            lg.addHandler(fh)
    return lg


class Trainer:
    def __init__(self, opt: dict):
        self.opt = opt
        maybe_initialize_distributed()
        # the data axis must divide the global batch; with fewer samples
        # than chips (debug configs), shrink to the largest divisor rather
        # than failing device_put (remaining chips idle, like torch DDP
        # with world_size > batch would refuse)
        n_dev = len(jax.devices())
        gbs = int(opt["datasets"]["train"]["batch_size"]) \
            if opt.get("datasets", {}).get("train") else n_dev
        data_axis = math.gcd(n_dev, gbs)
        if data_axis != n_dev and jax.process_count() > 1:
            # a mesh over a devices() prefix would need every process to
            # contribute addressable devices; under multi-process JAX a
            # partial mesh hangs instead of degrading — refuse clearly
            raise ValueError(
                f"global batch {gbs} must be divisible by {n_dev} devices "
                f"under multi-process JAX (process_count="
                f"{jax.process_count()}); raise batch_size or shrink the "
                "pool")
        if data_axis != n_dev:
            logger.warning(
                "global batch %d not divisible by %d devices; using a "
                "%d-wide data axis", gbs, n_dev, data_axis)
        self.mesh = create_mesh(data_axis=data_axis, model_axis=1,
                                devices=jax.devices()[:data_axis])

        if is_main_process():
            for key in ("experiments_root", "models", "training_state",
                        "val_images"):
                if opt["path"].get(key):
                    os.makedirs(opt["path"][key], exist_ok=True)
        setup_logger(opt["path"].get("log") if is_main_process() else None)
        logger.info(dict2str(opt))

        self.tb = None
        if opt.get("use_tb_logger") and "debug" not in opt["name"] and \
                is_main_process():
            try:
                from tensorboardX import SummaryWriter

                tb_dir = osp.join(opt["path"]["root"], "tb_logger", opt["name"])
                self.tb = SummaryWriter(log_dir=tb_dir)
            except Exception:  # pragma: no cover - tb optional
                logger.warning("tensorboardX unavailable; TB logging disabled")

        # datasets
        self.train_loader = None
        self.val_loader = None
        self.total_iters = int(opt["train"]["niter"])
        for phase, dataset_opt in opt["datasets"].items():
            if phase == "train":
                train_set = create_dataset(dataset_opt)
                self.train_loader = create_dataloader(train_set, dataset_opt, opt)
                batches_per_epoch = len(self.train_loader)
                self.total_epochs = int(
                    math.ceil(self.total_iters / max(1, batches_per_epoch)))
                logger.info(
                    f"Number of train images: {len(train_set)}, iters per "
                    f"epoch: {batches_per_epoch}; total epochs "
                    f"{self.total_epochs}, iters {self.total_iters}")
            elif phase == "val":
                val_set = create_dataset(dataset_opt)
                self.val_loader = create_dataloader(val_set, dataset_opt, opt)
                logger.info(f"Number of val images: {len(val_set)}")
        assert self.train_loader is not None

        # model + state; train.mixed_precision: bf16 activations with f32
        # params — halves the remat'd activation buffers that bound
        # training memory at 192^2 crops (PERF_NOTES.md)
        self.is_gan = "GAN" in (opt["model"] or "")
        # train.dcn_remat (default off): recompute each DCN forward inside
        # its backward.  Off saves the custom-VJP residuals instead — the
        # round-5 chip sweep measured 1.67 vs 1.53 it/s at the reference
        # 192^2/batch-8 recipe, and both flagship recipe shapes fit HBM
        # without the recompute.  Set `dcn_remat: true` if a larger custom
        # crop OOMs.
        from realvsr_tpu.models.common import set_dcn_remat
        set_dcn_remat(bool(opt["train"].get("dcn_remat") or False))
        g_dtype = (jnp.bfloat16 if opt["train"].get("mixed_precision")
                   else jnp.float32)
        self.model = define_g(opt, dtype=g_dtype)
        ds_train = opt["datasets"]["train"]
        nf = ds_train["N_frames"]
        size = ds_train.get("GT_size") or 64
        nc = (opt["network_G"].get("nc") or 3)
        sample = jnp.zeros((1, nf, size // (opt.get("scale") or 1),
                            size // (opt.get("scale") or 1), nc), jnp.float32)
        seed = int(opt["train"].get("manual_seed") or 0)
        if self.is_gan:
            from realvsr_tpu.models import define_d
            from realvsr_tpu.train.gan import create_gan_train_state

            self.model_d = define_d(opt)
            self.state = create_gan_train_state(
                self.model, self.model_d, opt, sample, jax.random.PRNGKey(seed))
        else:
            self.state = create_train_state(self.model, opt, sample,
                                            jax.random.PRNGKey(seed))
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.gen_params))
        logger.info(f"Network G: {type(self.model).__name__}, "
                    f"with parameters: {n_params:,d}")

        self.start_epoch, self.current_step = 0, 0
        self._load_or_resume()

        # optional frozen VGG feature extractor for perceptual losses
        feature_apply = None
        t_opt = opt["train"]
        if t_opt.get("feature_criterion") and float(
                t_opt.get("feature_weight") or 0.0) > 0:
            from realvsr_tpu.models import define_f

            net_f = define_f(opt)
            f_params = net_f.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)))["params"]
            if opt["path"].get("vgg_weights"):
                from realvsr_tpu.models.vgg import load_vgg19_weights

                f_params = load_vgg19_weights(f_params,
                                              opt["path"]["vgg_weights"])
            else:
                logger.warning("feature loss enabled without path.vgg_weights"
                               " — using randomly initialized VGG features")
            feature_apply = lambda x: net_f.apply({"params": f_params}, x)

        if self.is_gan:
            from realvsr_tpu.train.gan import make_gan_split_train_step

            self.train_step = jax.jit(
                make_gan_split_train_step(self.model, opt,
                                          feature_apply=feature_apply),
                donate_argnums=0)
        else:
            self.train_step = jax.jit(
                make_train_step(self.model, opt, feature_apply=feature_apply)
                if feature_apply is not None else make_train_step(self.model, opt),
                donate_argnums=0)
        self.eval_step = jax.jit(make_eval_step(self.model))
        self.rng = jax.random.PRNGKey(seed + 7)
        # (start, stop) step window for a jax.profiler trace (tools/train.py
        # --profile); None disables.  Replaces the reference's wall-clock-
        # only observability (SURVEY §5) with a real device trace.
        self.profile_steps = None

    @property
    def gen_params(self):
        return self.state.params_g if self.is_gan else self.state.params

    @property
    def gen_batch_stats(self):
        return (self.state.batch_stats_g if self.is_gan
                else self.state.batch_stats)

    @staticmethod
    def _net_tree(params, batch_stats):
        """Checkpoint/eval tree: variables dict when BN stats exist (the
        reference stores BN buffers inside the same .pth state_dict),
        bare params otherwise."""
        if batch_stats:
            return {"params": params, "batch_stats": batch_stats}
        return params

    # ------------------------------------------------------------------
    def _opt_state_tree(self):
        if self.is_gan:
            return {"g": self.state.opt_state_g, "d": self.state.opt_state_d}
        return self.state.opt_state

    def _load_or_resume(self):
        opt = self.opt
        resume_path = opt["path"].get("resume_state")
        if resume_path:
            step_str = osp.basename(resume_path).split(".")[0]
            check_resume(opt, step_str)
            step, epoch, opt_state = ckpt.load_training_state(
                resume_path, self._opt_state_tree())
            params, bs = self._load_net(opt["path"]["pretrain_model_G"],
                                        self.gen_params, self.gen_batch_stats)
            if self.is_gan:
                params_d, bs_d = self._load_net(
                    opt["path"]["pretrain_model_D"], self.state.params_d,
                    self.state.batch_stats_d)
                self.state = self.state.replace(
                    params_g=params, params_d=params_d,
                    opt_state_g=opt_state["g"], opt_state_d=opt_state["d"],
                    step=step, batch_stats_g=bs, batch_stats_d=bs_d)
            else:
                self.state = self.state.replace(params=params,
                                                opt_state=opt_state, step=step,
                                                batch_stats=bs)
            self.start_epoch, self.current_step = epoch, step
            logger.info(f"Resuming training from epoch {epoch}, iter {step}.")
        elif opt["path"].get("pretrain_model_G"):
            params, bs = self._load_net(opt["path"]["pretrain_model_G"],
                                        self.gen_params, self.gen_batch_stats)
            if self.is_gan:
                self.state = self.state.replace(params_g=params,
                                                batch_stats_g=bs)
            else:
                self.state = self.state.replace(params=params, batch_stats=bs)
            logger.info(
                f"Loaded pretrained G from {opt['path']['pretrain_model_G']}")

    def _load_net(self, path, params_template, bs_template):
        tree = ckpt.load_network(
            path, self._net_tree(params_template, bs_template))
        if bs_template:
            return tree["params"], tree["batch_stats"]
        return tree, bs_template

    # ------------------------------------------------------------------
    def validate(self, step: int) -> float:
        """Validation PSNR; clips are round-robined over processes like the
        reference's distributed validation (train.py:230-255), aggregated
        with a host all-gather instead of dist.reduce."""
        if self.val_loader is None:
            return float("nan")
        psnr_by_folder = defaultdict(list)
        n_proc = jax.process_count()
        rank = jax.process_index()
        for i, batch in enumerate(self.val_loader):
            if i % n_proc != rank:
                continue
            lqs = jnp.asarray(batch["LQs"], jnp.float32)
            out = self.eval_step(
                self._net_tree(self.gen_params, self.gen_batch_stats), lqs)
            out_np = np.asarray(out[0], np.float32)
            gt = np.asarray(batch["GT"][0], np.float32)
            psnr = metric_ops.calculate_psnr_np(
                np.clip(out_np, 0, 1) * 255.0, gt * 255.0)
            psnr_by_folder[batch["folder"][0]].append(psnr)
        if n_proc > 1:
            from jax.experimental import multihost_utils

            local = np.array([sum(sum(v) for v in psnr_by_folder.values()),
                              sum(len(v) for v in psnr_by_folder.values())])
            gathered = np.asarray(multihost_utils.process_allgather(local))
            total, count = gathered.sum(axis=0)
            psnr_avg = float(total / max(count, 1))
            logger.info(f"# Validation # PSNR: {psnr_avg:.6f}.")
            if self.tb:
                self.tb.add_scalar("psnr_avg", psnr_avg, step)
            return psnr_avg
        folder_means = {k: float(np.mean(v)) for k, v in psnr_by_folder.items()}
        psnr_avg = float(np.mean(list(folder_means.values())))
        for k, v in folder_means.items():
            logger.info(f"Folder {k} psnr: {v:.6f}.")
        logger.info(f"# Validation # PSNR: {psnr_avg:.6f}.")
        if self.tb:
            self.tb.add_scalar("psnr_avg", psnr_avg, step)
        return psnr_avg

    def save_checkpoint(self, epoch: int, step: int | str):
        if not is_main_process():
            return
        ckpt.save_network(
            self.opt["path"]["models"], "G", step,
            jax.device_get(self._net_tree(self.gen_params,
                                          self.gen_batch_stats)))
        if self.is_gan:
            ckpt.save_network(
                self.opt["path"]["models"], "D", step,
                jax.device_get(self._net_tree(self.state.params_d,
                                              self.state.batch_stats_d)))
        if isinstance(step, int):
            ckpt.save_training_state(self.opt["path"]["training_state"], step,
                                     epoch, self._opt_state_tree())
        logger.info("Saved models and training states.")

    # ------------------------------------------------------------------
    def train(self):
        opt = self.opt
        print_freq = int(opt["logger"]["print_freq"])
        save_freq = int(opt["logger"]["save_checkpoint_freq"])
        val_freq = int(opt["train"]["val_freq"]) if opt["train"].get(
            "val_freq") else None
        sharding = batch_sharding(self.mesh)

        # graceful preemption: SIGTERM/SIGINT save a resumable checkpoint
        # before exiting (the reference's torch trainer loses everything
        # since the last save_checkpoint_freq multiple; on preemptible
        # TPU pools the eviction signal IS the common shutdown path)
        import signal

        stop = {"flag": False}

        def _request_stop(signum, frame):
            stop["flag"] = True

        prev_handlers = {
            s: signal.signal(s, _request_stop)
            for s in (signal.SIGTERM, signal.SIGINT)
        }

        logger.info(f"Start training from epoch: {self.start_epoch:d}, "
                    f"iter: {self.current_step:d}")
        t_last = time.time()
        epoch = self.start_epoch
        while self.current_step <= self.total_iters:
            for batch in self.train_loader.epoch_iter(epoch):
                self.current_step += 1
                if self.current_step > self.total_iters:
                    break
                device_batch = {
                    "LQs": jax.device_put(batch["LQs"], sharding),
                    "GT": jax.device_put(batch["GT"], sharding),
                }
                if self.profile_steps is not None:
                    if self.current_step == self.profile_steps[0]:
                        jax.profiler.start_trace(
                            osp.join(self.opt["path"]["experiments_root"],
                                     "profile"))
                    elif self.current_step == self.profile_steps[1]:
                        jax.block_until_ready(self.gen_params)
                        jax.profiler.stop_trace()
                        logger.info("Saved profiler trace.")
                self.rng, sub = jax.random.split(self.rng)
                self.state, logs = self.train_step(self.state, device_batch, sub)

                if self.current_step % print_freq == 0:
                    logs = {k: float(v) for k, v in logs.items()}
                    elapsed = time.time() - t_last
                    ips = print_freq / max(elapsed, 1e-9)
                    t_last = time.time()
                    msg = (f"[epoch:{epoch:3d}, iter:{self.current_step:8,d}, "
                           f"{ips:.2f} it/s] ")
                    msg += " ".join(f"{k}: {v:.4e}" for k, v in logs.items())
                    logger.info(msg)
                    if self.tb:
                        for k, v in logs.items():
                            self.tb.add_scalar(k, v, self.current_step)

                if val_freq and self.current_step % val_freq == 0:
                    self.validate(self.current_step)

                if self.current_step % save_freq == 0:
                    self.save_checkpoint(epoch, self.current_step)
                if stop["flag"]:
                    break
            if stop["flag"]:
                logger.info("Stop signal received — saving and exiting.")
                break
            epoch += 1

        for s, h in prev_handlers.items():
            signal.signal(s, h)
        self.save_checkpoint(epoch, "latest")
        logger.info("End of training.")
        return self.state
