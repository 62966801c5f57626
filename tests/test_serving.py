"""Serving front-end: HTTP routes, worker batching, session spill/resume,
OpenAI adapter — on the tiny model over a synthetic clip.

Answer-equivalence assertions lean on the already-tested equalities:
generate_batch(b=1) == engine.generate (tests/test_batch.py) and
ChatSession save/load round-trips (tests/test_chat_session.py); here we
assert the HTTP surface reproduces the direct-API answers byte-for-byte.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from quickvideo_tpu.config import LVUConfig
from quickvideo_tpu.video import quickdecode as qd

pytestmark = pytest.mark.skipif(
    not qd.is_available(), reason="libquickdecode.so not built"
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serve") / "clip.mp4")
    qd.encode_test_video(path, width=112, height=112, nframes=64, fps=8,
                         gop=16)
    return path


@pytest.fixture(scope="module")
def lvu():
    from quickvideo_tpu.api import LVU

    return LVU(LVUConfig(
        model_name_or_path="tiny",
        model_type="qwen25_lvu",
        num_frames=8,
        video_group_size=4,
        top_p=0.5,
        max_decode_tokens=8,
        dtype="float32",
    ))


@pytest.fixture()
def served(lvu, tmp_path):
    from quickvideo_tpu.serving import ServerConfig, make_http_server

    cfg = ServerConfig(port=0, spill_dir=str(tmp_path / "spill"),
                       default_max_new_tokens=4, request_timeout_s=120)
    httpd, server = make_http_server(lvu, cfg)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, server
    httpd.shutdown()
    server.shutdown()


def _req(base, path, body=None, method=None):
    if body is not None:
        data = json.dumps(body).encode()
        r = urllib.request.Request(
            base + path, data=data, method=method or "POST",
            headers={"Content-Type": "application/json"},
        )
    else:
        r = urllib.request.Request(base + path, method=method or "GET")
    try:
        with urllib.request.urlopen(r) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_models_stats(served):
    base, _ = served
    assert _req(base, "/healthz") == (200, {"status": "ok"})
    code, models = _req(base, "/v1/models")
    assert code == 200 and models["data"][0]["id"] == "tiny"
    code, stats = _req(base, "/v1/stats")
    assert code == 200 and "queue_depth" in stats


def test_generate_matches_direct(served, lvu, video):
    base, _ = served
    direct = lvu.generate("What is happening?", video, max_new_tokens=4)[0]
    code, out = _req(base, "/v1/generate", {
        "video": video, "question": "What is happening?",
        "max_new_tokens": 4,
    })
    assert code == 200, out
    assert out["answer"] == direct


def test_burst_batches_same_video(served, video):
    base, server = served
    server.pause()  # hold the worker so the burst queues up
    results = {}

    def ask(i):
        results[i] = _req(base, "/v1/generate", {
            "video": video, "question": "Describe the clip.",
            "max_new_tokens": 4,
        })

    threads = [threading.Thread(target=ask, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    # the paused worker may already hold ONE popped job; the other two must
    # be queued before release so the drain sees all three
    for _ in range(200):
        if server._q.qsize() >= 2:
            break
        time.sleep(0.05)
    assert server._q.qsize() >= 2
    time.sleep(0.2)  # let the last enqueue land whichever side it is on
    server.resume()
    for t in threads:
        t.join(timeout=300)
    answers = {results[i][1]["answer"] for i in range(3)}
    assert all(results[i][0] == 200 for i in range(3))
    # identical greedy request -> identical answer, served from ONE batch
    assert len(answers) == 1
    assert server.stats["batches"].get(3, 0) >= 1


def test_sessions_incremental_and_spill(served, lvu, video, tmp_path):
    base, server = served
    code, s1 = _req(base, "/v1/sessions", {"video": video})
    assert code == 200
    sid1 = s1["session_id"]
    code, a1 = _req(base, f"/v1/sessions/{sid1}/ask",
                    {"question": "What happens?", "max_new_tokens": 4})
    assert code == 200 and isinstance(a1["answer"], str)

    # direct-API equivalence for the first turn
    direct = lvu.start_chat(video)
    assert a1["answer"] == direct.ask("What happens?", max_new_tokens=4)

    # second session evicts the first (max_resident_sessions=1) to disk
    code, s2 = _req(base, "/v1/sessions", {"video": video})
    sid2 = s2["session_id"]
    code, _ = _req(base, f"/v1/sessions/{sid2}/ask",
                   {"question": "And now?", "max_new_tokens": 4})
    assert code == 200
    assert server.stats["spills"] >= 1

    # asking session 1 again transparently resumes it from disk; the
    # follow-up matches the in-memory session's follow-up
    code, a2 = _req(base, f"/v1/sessions/{sid1}/ask",
                    {"question": "Why?", "max_new_tokens": 4})
    assert code == 200
    assert server.stats["resumes"] >= 1
    assert a2["answer"] == direct.ask("Why?", max_new_tokens=4)

    for sid in (sid1, sid2):
        code, out = _req(base, f"/v1/sessions/{sid}", method="DELETE")
        assert code == 200, out
    code, out = _req(base, f"/v1/sessions/{sid1}/ask",
                     {"question": "gone?"})
    assert code == 400


def test_openai_chat_completions(served, lvu, video):
    base, _ = served
    direct = lvu.generate("What is happening?", video, max_new_tokens=4)[0]
    code, out = _req(base, "/v1/chat/completions", {
        "model": "tiny",
        "max_tokens": 4,
        "messages": [{
            "role": "user",
            "content": [
                {"type": "video_url",
                 "video_url": {"url": f"file://{video}"}},
                {"type": "text", "text": "What is happening?"},
            ],
        }],
    })
    assert code == 200, out
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["content"] == direct
    assert out["choices"][0]["finish_reason"] == "stop"


def test_error_paths(served, video):
    base, _ = served
    code, out = _req(base, "/v1/generate",
                     {"video": "/nonexistent.mp4", "question": "?"})
    assert code == 400 and "not found" in out["error"]
    code, out = _req(base, "/v1/generate", {"question": "?"})
    assert code == 400
    code, out = _req(base, "/v1/nope", {})
    assert code == 404
    # malformed JSON body
    import urllib.request as u

    r = u.Request(base + "/v1/generate", data=b"{not json",
                  headers={"Content-Type": "application/json"})
    try:
        u.urlopen(r)
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_oversized_body_rejected_413(lvu, tmp_path):
    """Bodies over max_body_bytes are rejected from the Content-Length
    header BEFORE being read (round-4 serving polish)."""
    from quickvideo_tpu.serving import ServerConfig, make_http_server

    cfg = ServerConfig(port=0, spill_dir=str(tmp_path / "s"),
                       max_body_bytes=1024, request_timeout_s=30)
    httpd, server = make_http_server(lvu, cfg)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        big = json.dumps({"question": "x" * 4096, "video": "v"}).encode()
        r = urllib.request.Request(
            base + "/v1/generate", data=big,
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(r)
        assert ei.value.code == 413
        # small bodies still work after the rejected one
        code, _ = _req(base, "/healthz")
        assert code == 200
    finally:
        httpd.shutdown()
        server.shutdown()


def test_load_shedding_503(lvu, video, tmp_path):
    """Requests beyond max_queue_depth shed with 503 while queued ones
    complete: pause the worker, fill the queue, and burst one more."""
    from quickvideo_tpu.serving import ServerConfig, make_http_server

    cfg = ServerConfig(port=0, spill_dir=str(tmp_path / "s"),
                       max_queue_depth=2, request_timeout_s=120)
    httpd, server = make_http_server(lvu, cfg)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        server.pause()
        results = {}

        def go(i):
            results[i] = _req(base, "/v1/generate", {
                "video": video, "question": f"q{i}", "max_new_tokens": 2,
            })

        threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for _ in range(100):  # wait until both are admitted
            if server._admitted >= 2:
                break
            time.sleep(0.05)
        # queue full -> the next request sheds immediately with 503
        code, out = _req(base, "/v1/generate", {
            "video": video, "question": "shed-me", "max_new_tokens": 2,
        })
        assert code == 503 and "retry" in out["error"]
        assert server.stats.get("shed", 0) >= 1
        server.resume()
        for th in threads:
            th.join(timeout=120)
        assert all(c == 200 for c, _ in results.values()), results
    finally:
        httpd.shutdown()
        server.shutdown()


def test_openai_message_translation():
    from quickvideo_tpu.serving import (
        RequestError,
        openai_to_reference_messages,
    )

    msgs = openai_to_reference_messages([{
        "role": "user",
        "content": [
            {"type": "video_url",
             "video_url": {"url": "file:///a/b.mp4", "fps": 2.0}},
            {"type": "text", "text": "q"},
        ],
    }])
    assert msgs[0]["content"][0] == {"type": "video", "video": "/a/b.mp4",
                                     "fps": 2.0}
    # plain-string content passes through
    assert openai_to_reference_messages(
        [{"role": "system", "content": "be brief"}]
    )[0]["content"] == "be brief"
    with pytest.raises(RequestError):
        openai_to_reference_messages([{
            "role": "user",
            "content": [{"type": "video_url",
                         "video_url": {"url": "https://x/y.mp4"}}],
        }])


def _sse_frames(base, path, body):
    """POST and parse a text/event-stream response into JSON frames
    (excluding the [DONE] terminator, which is asserted present)."""
    data = json.dumps(body).encode()
    r = urllib.request.Request(
        base + path, data=data, method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(r) as resp:
        assert resp.status == 200
        assert resp.headers.get("Content-Type") == "text/event-stream"
        raw = resp.read().decode()
    frames = [ln[len("data: "):] for ln in raw.split("\n\n")
              if ln.startswith("data: ")]
    assert frames and frames[-1] == "[DONE]"
    return [json.loads(f) for f in frames[:-1]]


def test_stream_generate_sse(served, lvu, video):
    base, _ = served
    direct = lvu.generate("What is happening?", video, max_new_tokens=4)[0]
    frames = _sse_frames(base, "/v1/generate", {
        "video": video, "question": "What is happening?",
        "max_new_tokens": 4, "stream": True,
    })
    deltas = [f["delta"] for f in frames if "delta" in f]
    finals = [f for f in frames if "answer" in f]
    assert len(finals) == 1
    assert finals[0]["answer"] == direct
    assert "".join(deltas) == direct


def test_stream_chat_completions_openai_chunks(served, lvu, video):
    base, _ = served
    direct = lvu.generate("What is happening?", video, max_new_tokens=4)[0]
    frames = _sse_frames(base, "/v1/chat/completions", {
        "model": "tiny", "max_tokens": 4, "stream": True,
        "messages": [{
            "role": "user",
            "content": [
                {"type": "video_url",
                 "video_url": {"url": f"file://{video}"}},
                {"type": "text", "text": "What is happening?"},
            ],
        }],
    })
    assert all(f["object"] == "chat.completion.chunk" for f in frames)
    text = "".join(
        f["choices"][0]["delta"].get("content", "") for f in frames
    )
    assert text == direct
    assert frames[-1]["choices"][0]["finish_reason"] == "stop"
    # first content chunk announces the role, OpenAI-style
    first = next(f for f in frames
                 if f["choices"][0]["delta"].get("content"))
    assert first["choices"][0]["delta"].get("role") == "assistant"


def test_stream_session_ask_sse(served, lvu, video):
    base, _ = served
    code, out = _req(base, "/v1/sessions", {"video": video})
    assert code == 200, out
    sid = out["session_id"]
    frames = _sse_frames(base, f"/v1/sessions/{sid}/ask", {
        "question": "What is happening?", "max_new_tokens": 4,
        "stream": True,
    })
    finals = [f for f in frames if "answer" in f]
    assert len(finals) == 1
    deltas = "".join(f["delta"] for f in frames if "delta" in f)
    assert deltas == finals[0]["answer"]
    _req(base, f"/v1/sessions/{sid}", method="DELETE")


def test_mixed_stream_and_batch_burst(served, video):
    """A streaming request queued alongside identical non-streaming ones:
    the stream must NOT join their micro-batch (its nonce excludes it), all
    answers must agree, and the admission slot must drain back to zero."""
    base, server = served
    server.pause()
    results = {}

    def ask(i):
        results[i] = _req(base, "/v1/generate", {
            "video": video, "question": "Describe the clip.",
            "max_new_tokens": 4,
        })

    def ask_stream():
        results["s"] = _sse_frames(base, "/v1/generate", {
            "video": video, "question": "Describe the clip.",
            "max_new_tokens": 4, "stream": True,
        })

    threads = [threading.Thread(target=ask, args=(i,)) for i in range(2)]
    threads.append(threading.Thread(target=ask_stream))
    for t in threads:
        t.start()
    for _ in range(200):
        if server._q.qsize() >= 2:
            break
        time.sleep(0.05)
    time.sleep(0.2)
    server.resume()
    for t in threads:
        t.join(timeout=300)
    plain = {results[i][1]["answer"] for i in range(2)}
    assert len(plain) == 1
    stream_answer = [f["answer"] for f in results["s"] if "answer" in f]
    assert stream_answer == [plain.pop()]
    # admission slots fully released (stream generator drained)
    for _ in range(100):
        if server._admitted == 0:
            break
        time.sleep(0.05)
    assert server._admitted == 0
