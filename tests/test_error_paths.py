"""Error-path behavior: bad inputs fail loudly with actionable messages
(reference relies on HF/deepcodec exceptions; the TPU build validates at
the API boundary)."""

import numpy as np
import jax.numpy as jnp
import pytest

from quickvideo_tpu.config import LVUConfig, MeshConfig
from quickvideo_tpu.video import quickdecode as qd
from quickvideo_tpu.video.preprocess import plan_video, smart_nframes


def test_unknown_predict_type():
    with pytest.raises(ValueError, match="top_k_predict_type"):
        LVUConfig(top_k_predict_type="not_a_policy")


def test_unknown_model_type():
    from quickvideo_tpu.api import LVU

    with pytest.raises(ValueError, match="not registered"):
        LVU(LVUConfig(model_name_or_path="tiny", model_type="no_such_engine"))


def test_video_reader_missing_file():
    if not qd.is_available():
        pytest.skip("native decoder unavailable")
    with pytest.raises(IOError, match="cannot open"):
        qd.VideoReader("/nonexistent/clip.mp4")
    with pytest.raises(IOError, match="cannot open"):
        qd.InterleavedVideoReader("/nonexistent/clip.mp4")


def test_reader_bad_settings(tmp_path):
    if not qd.is_available():
        pytest.skip("native decoder unavailable")
    p = str(tmp_path / "c.mp4")
    qd.encode_test_video(p, width=64, height=64, nframes=8, fps=8)
    vr = qd.VideoReader(p)
    with pytest.raises(ValueError, match="interpolation"):
        vr.interpolation = "NEAREST_EXACT_FANCY"
    with pytest.raises(ValueError, match="output format"):
        vr.output_format = "YUV444"
    vr.close()


def test_capacity_overflow_rejected():
    """Requests needing more KV slots than the pinned capacity must be
    rejected up front (not silently truncated)."""
    import jax

    from quickvideo_tpu.models.qwen25_vl import get_config
    from quickvideo_tpu.models.qwen25_vl import model as qmodel
    from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs

    cfg = get_config("tiny")
    params = qmodel.init_params_fast(cfg, dtype=jnp.float32)
    lvu = LVUConfig(
        model_name_or_path="tiny", top_k=None, kv_cache_capacity=16,
        max_decode_tokens=8,
    )
    eng = LVUEngine(params, cfg, lvu, dtype=jnp.float32)
    t, h, w = 2, 4, 4
    n_units = t * (h // 2) * (w // 2)
    vid = cfg.video_token_id
    ids = np.array(
        [0, 1] + [vid] * n_units + [2, 3, 4], np.int64
    )
    pix = np.random.default_rng(0).standard_normal(
        (t * h * w, cfg.vision.patch_input_dim)
    ).astype(np.float32)
    with pytest.raises(ValueError, match="kv_cache_capacity"):
        eng.generate(
            PrefillInputs(ids, (t, h, w), [pix], [(t, h, w)], 2.0),
            max_new_tokens=2,
        )


def test_plan_video_zero_frames():
    with pytest.raises(Exception):
        plan_video(
            total_frames=0, video_fps=0, height=64, width=64,
            video_group_size=4,
        )


def test_smart_nframes_rejects_both_args():
    with pytest.raises(ValueError):
        smart_nframes(total_frames=10, video_fps=1.0, nframes=4, fps=2.0)


def test_mesh_config_validation():
    cfg = MeshConfig(dp=1, tp=2, sp=2)
    assert cfg.num_devices == 4


def test_hf_repo_id_without_local_checkpoint_rejected():
    """A repo-id path ('Org/Model') with no local checkpoint must raise, not
    silently fall back to random weights that generate fluent nonsense."""
    from quickvideo_tpu.api import LVU

    with pytest.raises(ValueError, match="not a local directory"):
        LVU(LVUConfig(model_name_or_path="Qwen/Qwen2.5-VL-7B-Instruct"))


def test_stream_close_stops_producer_before_reader(tmp_path):
    """close() mid-stream: the producer thread must be joined BEFORE the
    native reader handle is freed (a producer blocked inside qd_next_block
    on a freed handle is UB), and close() must not hang on a full queue."""
    if not qd.is_available():
        pytest.skip("native decoder not built")
    from quickvideo_tpu.video.stream import AsyncPixelGroups

    path = str(tmp_path / "close_race.mp4")
    qd.encode_test_video(path, width=160, height=128, nframes=64, fps=8, gop=8)
    lvu = LVUConfig(
        model_name_or_path="tiny", num_frames=32, video_group_size=4,
        prefetch_depth=1,  # tiny queue: producer blocks on put mid-video
    )
    stream = AsyncPixelGroups(path, lvu)
    next(iter(stream))  # producer is live and mid-pipeline
    stream.close()
    assert not any(t.is_alive() for t in stream._threads)
    assert stream.reader._h is None  # handle really was closed, post-join


def test_stream_producer_error_survives_full_queue():
    """ADVICE r1: a producer exception with a full bounded queue must reach
    the consumer as a raised error, not a hang — the consumer polls _exc on
    every queue wakeup (reference AsyncPixelIterator polls its exception
    field each loop, qwen25_lvu_interleaved.py:289-316)."""
    import queue

    from quickvideo_tpu.video.stream import AsyncPixelGroups

    obj = AsyncPixelGroups.__new__(AsyncPixelGroups)  # skip reader setup
    obj._q = queue.Queue(maxsize=1)
    obj._q.put(np.zeros(1))  # queue full: producer's sentinel put was dropped
    obj._exc = IOError("decode failed mid-video")

    it = iter(obj)
    assert next(it).shape == (1,)  # buffered item still delivered
    with pytest.raises(IOError, match="decode failed"):
        next(it)  # empty queue + pending exception -> raise, not block
