"""Native QuickDecode engine tests against synthetic fixtures whose frame
index is recoverable from pixel luma (no ffmpeg CLI in this environment).

Covers the reference decode contracts (SURVEY.md section 2.1): batch decode
with in-decoder resize, frame-ordinal accuracy across seeks, interleaved
streaming in presentation order with frame_iter blocks, thread scaling."""

import os

import numpy as np
import pytest

from quickvideo_tpu.video import quickdecode as qd

pytestmark = pytest.mark.skipif(
    not qd.is_available(), reason="libquickdecode.so not built"
)

# BT.601 limited-range luma -> RGB of a flat gray (U=V=128) frame is ~Y
# scaled to full range: R=G=B ~= (Y - 16) * 255/219


def luma_to_rgb(y):
    return np.clip((y - 16.0) * 255.0 / 219.0, 0, 255)


def rgb_to_frame_index(frame_chw):
    """Frame index lives in the top-left quarter's luma; sample its interior
    (away from block-edge blur after resize)."""
    h, w = frame_chw.shape[1:]
    region = frame_chw[:, h // 8 : 3 * h // 8, w // 8 : 3 * w // 8]
    y = region.mean() * 219.0 / 255.0 + 16.0
    return int(round(y - 20.0))


@pytest.fixture(scope="module")
def fixture_video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "test_120f.mp4")
    qd.encode_test_video(path, width=160, height=128, nframes=120, fps=10, gop=12)
    return path


class TestVideoReader:
    def test_metadata(self, fixture_video):
        vr = qd.VideoReader(fixture_video, num_threads=2)
        assert len(vr) == 120
        assert abs(vr.get_fps() - 10.0) < 0.01
        assert vr.source_width == 160 and vr.source_height == 128
        assert vr.num_keyframes >= 120 // 12  # gop 12 -> ~10 keyframes

    def test_get_batch_identity_and_resize(self, fixture_video):
        vr = qd.VideoReader(fixture_video, num_threads=4)
        vr.height = 64
        vr.width = 96
        vr.interpolation = "LANCZOS"
        idx = [0, 7, 23, 24, 50, 99, 119]
        batch = vr.get_batch(idx)
        assert batch.shape == (7, 3, 64, 96)
        assert batch.dtype == np.uint8
        for j, i in enumerate(idx):
            got = rgb_to_frame_index(batch[j])
            assert abs(got - i) <= 2, f"frame {i} decoded as ~{got}"

    def test_get_batch_native_size(self, fixture_video):
        vr = qd.VideoReader(fixture_video, num_threads=2)
        batch = vr.get_batch([5])
        assert batch.shape == (1, 3, 128, 160)
        assert abs(rgb_to_frame_index(batch[0]) - 5) <= 2

    def test_get_batch_request_order(self, fixture_video):
        """get_batch returns frames in REQUEST order (deepcodec/decord
        contract), including duplicates — decode happens in presentation
        order internally, rows are mapped back."""
        vr = qd.VideoReader(fixture_video, num_threads=2)
        idx = [50, 3, 99, 3, 27]
        batch = vr.get_batch(idx)
        assert batch.shape[0] == len(idx)
        for j, i in enumerate(idx):
            got = rgb_to_frame_index(batch[j])
            assert abs(got - i) <= 2, f"row {j}: wanted frame {i}, got ~{got}"
        np.testing.assert_array_equal(batch[1], batch[3])

    def test_bframe_stream_exact_and_nonref_skip(self, tmp_path):
        """B-frame streams (BluRay-like GOPs): delivery stays presentation-
        exact via PTS ordinal mapping, and prefix non-reference frames are
        SKIPPED inside the decoder when not wanted (QD_SKIP_NONREF,
        default on) — same bytes out, ~half the coded frames."""
        import os

        path = str(tmp_path / "bframes.mp4")
        qd.encode_test_video(
            path, width=160, height=128, nframes=192, fps=24, gop=24,
            bframes=2,
        )

        def run(env_off):
            if env_off:
                os.environ["QD_SKIP_NONREF"] = "0"
            try:
                vr = qd.VideoReader(path, num_threads=2)
                idx = sorted(set(list(range(0, 192, 5)) + [7, 13, 22]))
                batch = vr.get_batch(idx)
                coded = sum(
                    s["coded_frames"] for s in vr.worker_stats()
                )
                vr.close()
                return idx, batch, coded
            finally:
                os.environ.pop("QD_SKIP_NONREF", None)

        idx, b_on, coded_on = run(env_off=False)
        _, b_off, coded_off = run(env_off=True)
        for j, i in enumerate(idx):
            got = rgb_to_frame_index(b_on[j])
            assert abs(got - i) <= 2, f"row {j}: wanted {i}, got ~{got}"
        np.testing.assert_array_equal(b_on, b_off)
        # ~every 5th frame wanted, 2 of 3 frames are non-ref Bs: the skip
        # must remove a large fraction of the prefix decode work
        assert coded_on < 0.7 * coded_off, (coded_on, coded_off)

    def test_bframe_skip_parity_fuzz(self, tmp_path):
        """Property: for ANY sampling pattern, decode with non-ref skipping
        equals decode without it, byte for byte."""
        import os

        rng = np.random.default_rng(7)
        path = str(tmp_path / "bfuzz.mp4")
        qd.encode_test_video(
            path, width=160, height=128, nframes=120, fps=24, gop=16,
            bframes=2,
        )

        def batch(idx, skip_on):
            os.environ["QD_SKIP_NONREF"] = "1" if skip_on else "0"
            try:
                vr = qd.VideoReader(path, num_threads=2)
                out = vr.get_batch(idx)
                vr.close()
                return out
            finally:
                os.environ.pop("QD_SKIP_NONREF", None)

        for trial in range(8):
            n = int(rng.integers(1, 24))
            idx = sorted(rng.choice(120, size=n, replace=False).tolist())
            b_on = batch(idx, True)
            b_off = batch(idx, False)
            np.testing.assert_array_equal(b_on, b_off, err_msg=str(idx))

    def test_bframe_dense_decode_untouched(self, tmp_path):
        """When every frame is wanted nothing may be skipped."""
        path = str(tmp_path / "bdense.mp4")
        qd.encode_test_video(
            path, width=160, height=128, nframes=72, fps=24, gop=24,
            bframes=2,
        )
        vr = qd.VideoReader(path, num_threads=1)
        batch = vr.get_batch(list(range(72)))
        coded = sum(s["coded_frames"] for s in vr.worker_stats())
        vr.close()
        for i in range(72):
            got = rgb_to_frame_index(batch[i])
            assert abs(got - i) <= 2, (i, got)
        assert coded >= 72

    def test_bframe_interleaved_stream(self, tmp_path):
        """The streaming (interleaved) path delivers B-frame content in
        order through the same PTS-mapped decode."""
        path = str(tmp_path / "bstream.mp4")
        qd.encode_test_video(
            path, width=160, height=128, nframes=96, fps=24, gop=24,
            bframes=2,
        )
        vr = qd.InterleavedVideoReader(path, num_threads=2, num_intervals=4)
        idx = list(range(0, 96, 3))
        vr.process(idx)
        vr.frame_iter = 8
        got = []
        for block in vr:
            got.extend(rgb_to_frame_index(f) for f in block)
        vr.close()
        assert len(got) == len(idx)
        for want, g in zip(idx, got):
            assert abs(g - want) <= 2, (want, g)

    def test_truncated_file_fails_cleanly(self, tmp_path):
        """A truncated mp4 (moov atom lost) must raise a clean IOError at
        open — never crash — so the reader fallback chain can take over."""
        src = str(tmp_path / "whole.mp4")
        qd.encode_test_video(src, 160, 128, nframes=48, fps=12, gop=12)
        cut = str(tmp_path / "cut.mp4")
        data = open(src, "rb").read()
        open(cut, "wb").write(data[: len(data) // 2])
        with pytest.raises(IOError, match="cannot open"):
            qd.VideoReader(cut, num_threads=1)

    def test_corrupt_payload_decodes_gracefully(self, tmp_path):
        """Bitstream damage inside the media payload must not crash or
        wedge: FFmpeg error-concealment yields frames (garbled content is
        acceptable; shape/count contract holds)."""
        src = str(tmp_path / "tex.mp4")
        qd.encode_textured_video(src, width=320, height=240, nframes=96,
                                 fps=12, gop=12)
        data = bytearray(open(src, "rb").read())
        i = bytes(data).find(b"mdat")
        start = i + 8 + len(data) // 3
        data[start:start + 16384] = b"\0" * 16384
        bad = str(tmp_path / "bad.mp4")
        open(bad, "wb").write(bytes(data))
        vr = qd.VideoReader(bad, num_threads=2)
        batch = vr.get_batch(list(range(0, 96, 8)))
        vr.close()
        assert batch.shape == (12, 3, 240, 320)

    def test_thread_counts_agree(self, fixture_video):
        idx = list(range(0, 120, 7))
        ref = None
        for nt in (1, 2, 8):
            vr = qd.VideoReader(fixture_video, num_threads=nt)
            vr.height = 64
            vr.width = 64
            b = vr.get_batch(idx)
            if ref is None:
                ref = b
            else:
                np.testing.assert_array_equal(b, ref)

    def test_missing_file(self):
        with pytest.raises(IOError):
            qd.VideoReader("/nonexistent/file.mp4")


class TestInterleaved:
    def test_stream_in_order(self, fixture_video):
        vr = qd.InterleavedVideoReader(
            fixture_video, num_threads=4, num_intervals=8
        )
        vr.height = 64
        vr.width = 64
        idx = list(range(0, 120, 3))  # 40 frames
        vr.process(idx)
        vr.frame_iter = 6
        got = []
        blocks = 0
        for block in vr:
            assert block.shape[1:] == (3, 64, 64)
            blocks += 1
            for f in block:
                got.append(rgb_to_frame_index(f))
        assert blocks == (40 + 5) // 6
        assert len(got) == 40
        for want, g in zip(idx, got):
            assert abs(g - want) <= 2

    def test_single_interval_single_thread(self, fixture_video):
        vr = qd.InterleavedVideoReader(
            fixture_video, num_threads=1, num_intervals=1
        )
        vr.process([0, 10, 20])
        vr.frame_iter = 2
        frames = [f for block in vr for f in block]
        assert len(frames) == 3


def test_long_fixture_many_intervals(tmp_path):
    """600-frame fixture, gop 30, 16 intervals x 8 threads."""
    path = str(tmp_path / "long.mp4")
    qd.encode_test_video(path, width=128, height=96, nframes=600, fps=30, gop=30)
    vr = qd.InterleavedVideoReader(path, num_threads=8, num_intervals=16)
    vr.height = 56
    vr.width = 56
    idx = list(range(0, 600, 10))  # 60 frames, 1 "fps"
    vr.process(idx)
    vr.frame_iter = 16
    got = [rgb_to_frame_index(f) for block in vr for f in block]
    assert len(got) == 60
    # luma encodes i % 200 — compare modulo the wrap
    bad = sum(
        1 for want, g in zip(idx, got)
        if min(abs(g - want % 200), 200 - abs(g - want % 200)) > 2
    )
    assert bad == 0, f"{bad} misdecoded frames"


def test_yuv420_device_conversion_matches_sws_rgb(fixture_video):
    """Decode the same frames as RGB (swscale converts) and as YUV420
    (our device BT.601 converts); outputs must agree within rounding."""
    import jax.numpy as jnp

    idx = [0, 11, 37]
    vr = qd.VideoReader(fixture_video, num_threads=1)
    vr.height = 64
    vr.width = 64
    rgb = vr.get_batch(idx)  # (3, 3, 64, 64)
    vr.output_format = "YUV420"
    yuv = vr.get_batch(idx)  # (3, 6144)
    assert yuv.shape == (3, 64 * 64 * 3 // 2)

    hw = 64 * 64
    y = yuv[:, :hw].reshape(-1, 64, 64).astype(np.float32)
    u = yuv[:, hw : hw + hw // 4].reshape(-1, 32, 32).astype(np.float32)
    v = yuv[:, hw + hw // 4 :].reshape(-1, 32, 32).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, 1), 2, 2) - 128.0
    v = np.repeat(np.repeat(v, 2, 1), 2, 2) - 128.0
    c = (y - 16.0) * 1.1643835
    r = c + 1.5960268 * v
    g = c - 0.3917623 * u - 0.8129676 * v
    b = c + 2.0172321 * u
    ours = np.clip(np.stack([r, g, b], 1), 0, 255)
    diff = np.abs(ours - rgb.astype(np.float32))
    # chroma upsampling differs (sws interpolates, we use nearest): compare
    # the bulk; allow a small tail of edge pixels to deviate more
    assert np.percentile(diff, 90) <= 4.0, np.percentile(diff, 90)
    assert diff.mean() <= 2.5, diff.mean()


def test_unaligned_width_scratch_path(fixture_video):
    """Widths not divisible by 32 route sws output through the
    aligned-stride scratch (unaligned row stores cost ~4x inside
    sws_scale); content must match the direct path's semantics for both
    output formats."""
    idx = [0, 23, 50]
    vr = qd.VideoReader(fixture_video, num_threads=1)
    vr.height = 68
    vr.width = 92  # 92 % 32 != 0 -> scratch path
    vr.interpolation = "LANCZOS"
    rgb = vr.get_batch(idx)
    assert rgb.shape == (3, 3, 68, 92)
    for j, i in enumerate(idx):
        got = rgb_to_frame_index(rgb[j])
        assert abs(got - i) <= 2, f"frame {i} decoded as ~{got}"
    vr.output_format = "YUV420"
    yuv = vr.get_batch(idx)
    assert yuv.shape == (3, 68 * 92 * 3 // 2)
    hw = 68 * 92
    y = yuv[:, :hw].reshape(-1, 68, 92).astype(np.float32)
    u = yuv[:, hw : hw + hw // 4].reshape(-1, 34, 46).astype(np.float32)
    v = yuv[:, hw + hw // 4 :].reshape(-1, 34, 46).astype(np.float32)
    u = np.repeat(np.repeat(u, 2, 1), 2, 2) - 128.0
    v = np.repeat(np.repeat(v, 2, 1), 2, 2) - 128.0
    c = (y - 16.0) * 1.1643835
    ours = np.clip(np.stack([
        c + 1.5960268 * v,
        c - 0.3917623 * u - 0.8129676 * v,
        c + 2.0172321 * u,
    ], 1), 0, 255)
    diff = np.abs(ours - rgb.astype(np.float32))
    assert np.percentile(diff, 90) <= 4.0, np.percentile(diff, 90)
    assert diff.mean() <= 2.5, diff.mean()
