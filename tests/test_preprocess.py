"""Preprocessing parity: patchify/normalize vs the HF Qwen2VL image
processor, plus smart_resize / smart_nframes / budget semantics."""

import numpy as np
import pytest

from quickvideo_tpu.video import preprocess as pp


class TestSmartResize:
    def test_multiples_of_28(self):
        h, w = pp.smart_resize(480, 640)
        assert h % 28 == 0 and w % 28 == 0

    def test_max_pixels_respected(self):
        h, w = pp.smart_resize(1080, 1920, max_pixels=448 * 448)
        assert h * w <= 448 * 448
        assert h % 28 == 0 and w % 28 == 0

    def test_min_pixels_respected(self):
        h, w = pp.smart_resize(56, 56, min_pixels=256 * 28 * 28)
        assert h * w >= 256 * 28 * 28

    def test_aspect_guard(self):
        with pytest.raises(ValueError):
            pp.smart_resize(28, 28 * 300)


class TestSmartNframes:
    def test_nframes_rounding(self):
        assert pp.smart_nframes(total_frames=100, video_fps=30, nframes=33) == 32

    def test_fps_mode(self):
        # 300 frames at 30fps = 10s; fps=2 -> 20 frames
        assert pp.smart_nframes(total_frames=300, video_fps=30, fps=2.0) == 20

    def test_hour_long_cap_lifted(self):
        # 1 fps over an hour at 24fps: 3600 frames; upstream cap 768 would
        # clamp — the reference lifts FPS_MAX_FRAMES to 100k
        n = pp.smart_nframes(total_frames=86400, video_fps=24, fps=1.0)
        assert n == 3600

    def test_budget(self):
        mn, mx = pp.video_pixel_budget(3600)
        assert mx >= int(mn * 1.05)
        mn2, mx2 = pp.video_pixel_budget(4, requested_max_pixels=360 * 420)
        assert mx2 == 360 * 420


class TestPatchifyParity:
    @pytest.mark.parametrize("t,h,w", [(4, 56, 84), (2, 112, 112), (3, 56, 56)])
    def test_matches_hf_processor(self, t, h, w):
        torch = pytest.importorskip("torch")
        from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
            Qwen2VLImageProcessor,
        )

        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, (t, h, w, 3), dtype=np.uint8)
        proc = Qwen2VLImageProcessor(do_resize=False)
        out = proc(
            images=None, videos=[list(frames)], return_tensors="np"
        )
        hf_patches = out["pixel_values_videos"]
        hf_grid = tuple(out["video_grid_thw"][0].tolist())

        ours = pp.normalize_frames(frames)
        patches, grid = pp.patchify_frames(ours)
        assert grid == hf_grid
        np.testing.assert_allclose(patches, hf_patches, rtol=2e-3, atol=2e-3)

    def test_odd_frame_count_repeats_last(self):
        frames = np.zeros((3, 28, 28, 3), np.uint8)
        frames[2] = 255
        patches, grid = pp.patchify_frames(pp.normalize_frames(frames))
        assert grid == (2, 2, 2)


class TestPlan:
    def test_group_split(self):
        plan = pp.plan_video(
            total_frames=600, video_fps=30, height=480, width=640,
            video_group_size=7, fps=1.0,
        )
        # 20 frames sampled at 1fps; group size rounded up to 8
        assert plan.nframes == 20
        assert plan.group_frame_counts == [8, 8, 4]
        assert [g[0] for g in plan.group_grids] == [4, 4, 2]
        assert plan.grid_thw[0] == 10
        assert plan.resized_height % 28 == 0

    def test_no_grouping(self):
        plan = pp.plan_video(
            total_frames=100, video_fps=10, height=280, width=280,
            video_group_size=None, nframes=10,
        )
        assert plan.group_frame_counts == [10]
        assert plan.second_per_grid_ts == pytest.approx(2 / plan.sample_fps)


class TestUint8Path:
    def test_uint8_patchify_plus_device_norm_matches_float_path(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        frames = rng.integers(0, 256, (4, 3, 56, 56), dtype=np.uint8)
        # float path (HF-parity reference)
        ref, grid_f = pp.patchify_frames(pp.normalize_frames(frames))
        # uint8 path + device affine
        u8, grid_u = pp.patchify_frames_uint8(frames)
        assert grid_f == grid_u
        scale, bias = pp.patch_norm_scale_bias()
        got = np.asarray(
            jnp.asarray(u8, jnp.float32) * scale + bias
        )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_window_aligned_resize():
    plan = pp.plan_video(
        total_frames=600, video_fps=30, height=448, width=448,
        video_group_size=32, nframes=64, requested_max_pixels=360 * 420,
        align_to=112,
    )
    assert plan.resized_height % 112 == 0 and plan.resized_width % 112 == 0
    # uniform windows for this grid
    from quickvideo_tpu.models.qwen25_vl.vision import build_layout
    lo = build_layout(plan.group_grids[0], 14, 2, 112, 80)
    assert lo.win_uniform


class TestDeviceResize:
    def test_lanczos3_matches_pil_lanczos(self):
        """jax.image.resize lanczos3 (the resize_on_device resampler) vs PIL
        LANCZOS — same 3-lobe filter family; parity within resampler
        rounding/boundary handling."""
        import jax
        import jax.numpy as jnp
        from PIL import Image

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (96, 96, 3), np.uint8)
        # smooth it a little so boundary handling differences don't dominate
        img = (img.astype(np.float32) + np.roll(img, 1, 0) + np.roll(img, 1, 1)) / 3.0
        tgt = (56, 56)
        ours = np.asarray(jnp.clip(jax.image.resize(
            jnp.asarray(img), (*tgt, 3), method="lanczos3", antialias=True,
        ), 0, 255))
        ref = np.asarray(
            Image.fromarray(img.astype(np.uint8)).resize(
                tgt[::-1], Image.LANCZOS
            )
        ).astype(np.float32)
        diff = np.abs(ours - ref)
        assert diff.mean() < 2.0, diff.mean()
        assert np.percentile(diff, 99) < 8.0, np.percentile(diff, 99)

    def test_vision_forward_native_yuv_close_to_preresized(self):
        """Full device pipeline: packed native-size YUV + native_hw must be
        close to feeding the same frames pre-resized on the host."""
        import jax
        import jax.numpy as jnp
        from quickvideo_tpu.models.qwen25_vl import get_config
        from quickvideo_tpu.models.qwen25_vl import model as qmodel
        from quickvideo_tpu.models.qwen25_vl.vision import init_vision_params

        cfg = get_config("tiny")
        rng = np.random.default_rng(1)
        t_frames, nh, nw = 2, 84, 84
        fh = fw = 56  # target grid
        yuv = rng.integers(16, 235, (t_frames, nh * nw * 3 // 2), np.uint8)
        params = {"vision": init_vision_params(
            cfg.vision, jax.random.key(0), jnp.float32
        )}
        grid = (1, fh // cfg.vision.patch_size, fw // cfg.vision.patch_size)
        out_native = qmodel.encode_video_group(
            params, cfg, jnp.asarray(yuv), grid, native_hw=(nh, nw)
        )
        # host reference: device YUV->RGB at native size, PIL-free lanczos3
        # resize outside the program, then the pre-resized YUV-free path
        hw = nh * nw
        y = yuv[:, :hw].reshape(t_frames, nh, nw).astype(np.float32)
        u = yuv[:, hw : hw + hw // 4].reshape(t_frames, nh // 2, nw // 2)
        v = yuv[:, hw + hw // 4 :].reshape(t_frames, nh // 2, nw // 2)
        u = np.repeat(np.repeat(u, 2, 1), 2, 2).astype(np.float32) - 128.0
        v = np.repeat(np.repeat(v, 2, 1), 2, 2).astype(np.float32) - 128.0
        c = (y - 16.0) * 1.1643835
        rgb = np.stack([
            c + 1.5960268 * v,
            c - 0.3917623 * u - 0.8129676 * v,
            c + 2.0172321 * u,
        ], axis=1).clip(0, 255)
        rgb_r = np.asarray(jax.image.resize(
            jnp.asarray(rgb), (t_frames, 3, fh, fw), method="lanczos3",
            antialias=True,
        )).clip(0, 255)
        out_host = qmodel.encode_video_group(
            params, cfg, jnp.asarray(rgb_r.astype(np.uint8)), grid
        )
        np.testing.assert_allclose(
            np.asarray(out_native), np.asarray(out_host), rtol=0.1, atol=0.35
        )
