"""Eval harness (answer extraction, QA loop) and frame disk cache tests."""

import numpy as np
import pytest

from quickvideo_tpu.evaluation import (
    QASample,
    extract_choice,
    format_mc_question,
    run_qa_eval,
)


class TestExtractChoice:
    @pytest.mark.parametrize("text,want", [
        ("A", "A"),
        ("B.", "B"),
        ("(C)", "C"),
        ("C) because...", "C"),
        ("The answer is D", "D"),
        ("the best answer is: (B)", "B"),
        ("I think it is clearly option A here", "A"),
        ("no idea", None),
    ])
    def test_cases(self, text, want):
        assert extract_choice(text) == want

    def test_respects_n_options(self):
        assert extract_choice("C", n_options=2) is None


def test_format_mc_question():
    s = QASample("v.mp4", "What?", ["red", "blue"], "A")
    t = format_mc_question(s)
    assert "A. red" in t and "B. blue" in t and "What?" in t
    s2 = QASample("v.mp4", "What?", ["A. red", "B. blue"], "A")
    assert "A. red" in format_mc_question(s2)


def test_run_qa_eval_with_stub():
    class StubLVU:
        def __init__(self, answers):
            self.answers = iter(answers)

        def generate(self, q, v, **kw):
            return [next(self.answers)]

    samples = [
        QASample("a.mp4", "q1", ["x", "y"], "A", id="1"),
        QASample("b.mp4", "q2", ["x", "y"], "B", id="2"),
        QASample("c.mp4", "q3", ["x", "y"], "B", id="3"),
    ]
    res = run_qa_eval(StubLVU(["A", "A", "The answer is B"]), samples)
    assert res["n"] == 3
    assert res["accuracy"] == pytest.approx(2 / 3)
    assert [p["correct"] for p in res["per_sample"]] == [True, False, True]


class TestFrameCache:
    def test_roundtrip(self, tmp_path):
        from quickvideo_tpu.video import frame_cache
        from quickvideo_tpu.video.preprocess import VideoPlan

        plan = VideoPlan(
            nframes=4,
            indices=np.array([0, 10, 20, 30]),
            resized_height=56,
            resized_width=56,
            sample_fps=1.0,
            second_per_grid_ts=2.0,
            group_frame_counts=[4],
            group_grids=[(2, 4, 4)],
        )
        frames = np.random.default_rng(0).integers(
            0, 255, (4, 3, 56, 56), dtype=np.uint8
        )
        assert frame_cache.load("vid.mp4", plan, str(tmp_path)) is None
        frame_cache.save("vid.mp4", plan, frames, str(tmp_path))
        got = frame_cache.load("vid.mp4", plan, str(tmp_path))
        np.testing.assert_array_equal(np.asarray(got), frames)

    def test_stale_on_shape_change(self, tmp_path):
        from quickvideo_tpu.video import frame_cache
        from quickvideo_tpu.video.preprocess import VideoPlan

        def plan(h):
            return VideoPlan(
                nframes=2, indices=np.array([0, 1]), resized_height=h,
                resized_width=56, sample_fps=1.0, second_per_grid_ts=2.0,
                group_frame_counts=[2], group_grids=[(1, 4, 4)],
            )

        frames = np.zeros((2, 3, 56, 56), np.uint8)
        frame_cache.save("v.mp4", plan(56), frames, str(tmp_path))
        # different resize -> different key -> miss
        assert frame_cache.load("v.mp4", plan(84), str(tmp_path)) is None


def test_shard_samples():
    from quickvideo_tpu.evaluation import shard_samples

    xs = list(range(10))
    a = shard_samples(xs, rank=0, world=3)
    b = shard_samples(xs, rank=1, world=3)
    c = shard_samples(xs, rank=2, world=3)
    assert sorted(a + b + c) == xs
    assert shard_samples(xs, rank=0, world=1) == xs
