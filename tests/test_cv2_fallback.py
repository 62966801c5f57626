"""OpenCV fallback backend (VERDICT r3 item 5 / missing #5).

The reference degrades deepcodec -> decord -> torchvision
(lvu/models/qwen25_lvu.py:215-265,344-348); our chain is quickdecode ->
opencv. These tests pin: frame parity between the two backends, request-order
get_batch, and the end-to-end degradation path under DEEPCODEC_DISABLED."""

import numpy as np
import pytest

from quickvideo_tpu.video import quickdecode as qd

cv2 = pytest.importorskip("cv2")

from quickvideo_tpu.video.cv2_reader import Cv2VideoReader  # noqa: E402


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("v") / "clip.mp4")
    if not qd.is_available():
        pytest.skip("native decoder not built (fixture encoder lives there)")
    qd.encode_test_video(p, width=112, height=112, nframes=48, fps=8, gop=8)
    return p


def test_cv2_reader_native_size_matches_quickdecode(video):
    """Same H.264 bitstream, two FFmpeg-based decoders: the decoded YUV is
    bit-identical, so RGB differs only by the YUV->RGB converter (swscale vs
    cv2) — a few counts per channel."""
    idx = [0, 7, 8, 23, 40]
    vq = qd.VideoReader(video, num_threads=2)
    ref = vq.get_batch(idx)
    vq.close()
    vc = Cv2VideoReader(video)
    assert len(vc) == 48
    assert vc.source_height == 112 and vc.source_width == 112
    got = vc.get_batch(idx)
    vc.close()
    assert got.shape == ref.shape and got.dtype == np.uint8
    diff = np.abs(got.astype(np.int16) - ref.astype(np.int16))
    assert diff.mean() < 2.0 and diff.max() <= 16, (diff.mean(), diff.max())


def test_cv2_reader_request_order_and_resize(video):
    """Indices in arbitrary (unsorted, with repeats) order come back in
    REQUEST order; resize honors height/width."""
    vc = Cv2VideoReader(video)
    vc.height, vc.width = 56, 84
    vc.interpolation = "LANCZOS"
    shuffled = [30, 2, 2, 17, 9]
    got = vc.get_batch(shuffled)
    assert got.shape == (5, 3, 56, 84)
    sorted_back = vc.get_batch(sorted(set(shuffled)))
    vc.close()
    by_idx = {i: f for i, f in zip(sorted(set(shuffled)), sorted_back)}
    for row, i in enumerate(shuffled):
        np.testing.assert_array_equal(got[row], by_idx[i])


def test_backend_priority_degrades_not_raises(monkeypatch, video):
    """DEEPCODEC_DISABLED=1 with the opencv backend registered: the chain
    degrades (the reference's decord/torchvision behavior) instead of
    raising (round-3 gap: the chain was empty beyond quickdecode)."""
    from quickvideo_tpu.video import reader as vr

    monkeypatch.setenv("DEEPCODEC_DISABLED", "1")
    names = vr.backend_priority()
    assert "quickdecode" not in names
    assert "opencv" in names
    name, r = vr.open_reader(video, 2)
    assert name == "opencv"
    assert len(r) == 48
    r.close()


def test_lvu_e2e_on_opencv_fallback(monkeypatch, video):
    """Full LVU.generate with the native engine disabled: the sync batch
    engine runs end-to-end on the opencv backend."""
    from quickvideo_tpu.api import LVU
    from quickvideo_tpu.config import LVUConfig

    monkeypatch.setenv("DEEPCODEC_DISABLED", "1")
    lvu = LVU(LVUConfig(
        model_name_or_path="tiny", model_type="qwen25_lvu",
        num_frames=8, video_group_size=4, top_p=0.5,
        max_decode_tokens=8, dtype="float32",
    ))
    out = lvu.generate("What?", video, max_new_tokens=3)
    assert len(lvu.last_result.tokens) == 3
