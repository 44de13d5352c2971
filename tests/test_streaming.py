"""Streaming inference (eval/streaming.py) must be exact memoization:
identical outputs to the per-window full model over a whole sequence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realvsr_tpu.eval.streaming import StreamingRunner
from realvsr_tpu.models.edvr import EDVRNoUp
from realvsr_tpu.utils.indexing import index_generation


@pytest.fixture(scope="module")
def small_model():
    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=2,
                     back_RBs=2, predeblur=False, HR_in=False, w_TSA=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 32, 32, 3)))["params"]
    return model, params


def test_streaming_matches_full_model(small_model):
    model, params = small_model
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(size=(5, 32, 64, 3)), jnp.float32)

    runner = StreamingRunner(model, params, padding="replicate")
    stream_out = np.asarray(runner.run(frames))

    full = jax.jit(lambda p, x: model.apply({"params": p}, x))
    for t in range(frames.shape[0]):
        sel = index_generation(t, frames.shape[0], 3, padding="replicate")
        window = frames[jnp.asarray(sel)][None]
        ref = np.asarray(full(params, window))[0]
        np.testing.assert_allclose(stream_out[t], ref, atol=2e-5,
                                   err_msg=f"frame {t}")


def test_streaming_lazy_matches_run(small_model):
    model, params = small_model
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)), jnp.float32)
    runner = StreamingRunner(model, params)
    a = np.asarray(runner.run(frames))
    b = np.stack([np.asarray(o) for o in runner.run_lazy(frames)])
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_streaming_scan_matches_run(small_model):
    model, params = small_model
    rng = np.random.default_rng(2)
    frames = jnp.asarray(rng.uniform(size=(6, 32, 32, 3)), jnp.float32)
    runner = StreamingRunner(model, params, padding="replicate")
    a = np.asarray(runner.run(frames))
    b = np.asarray(runner.run_scan(frames))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_streaming_edvr_x4_matches_full_model():
    """EDVR (x4 upsampling) now supports the pyramid/fuse split modes
    (advisor round-3 low: StreamingRunner claimed EDVR support but only
    EDVRNoUp accepted the mode kwarg)."""
    from realvsr_tpu.models.edvr import EDVR

    model = EDVR(nf=16, nc=3, nframes=3, groups=4, front_RBs=2,
                 back_RBs=2, predeblur=False, HR_in=False, w_TSA=False)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 3, 16, 16, 3)))["params"]
    rng = np.random.default_rng(4)
    frames = jnp.asarray(rng.uniform(size=(4, 16, 24, 3)), jnp.float32)

    runner = StreamingRunner(model, params, padding="replicate")
    stream_out = np.asarray(runner.run(frames))
    assert stream_out.shape == (4, 64, 96, 3)

    full = jax.jit(lambda p, x: model.apply({"params": p}, x))
    for t in range(frames.shape[0]):
        sel = index_generation(t, frames.shape[0], 3, padding="replicate")
        window = frames[jnp.asarray(sel)][None]
        ref = np.asarray(full(params, window))[0]
        np.testing.assert_allclose(stream_out[t], ref, atol=2e-5,
                                   err_msg=f"frame {t}")


def test_run_scan_clips_matches_per_clip():
    """Batched-clip scan == per-clip run_scan for each clip."""
    import numpy as np

    from realvsr_tpu.eval.streaming import StreamingRunner
    from realvsr_tpu.models.edvr import EDVRNoUp

    model = EDVRNoUp(nf=8, nc=3, nframes=3, groups=2, front_RBs=1,
                     back_RBs=1, predeblur=False, HR_in=False, w_TSA=False)
    rng = np.random.default_rng(0)
    clips = jnp.asarray(rng.uniform(size=(2, 5, 16, 16, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 16, 16, 3)))["params"]
    runner = StreamingRunner(model, params)
    batched = np.asarray(runner.run_scan_clips(clips))
    for b in range(clips.shape[0]):
        single = np.asarray(runner.run_scan(clips[b]))
        np.testing.assert_allclose(batched[b], single, atol=2e-6)
