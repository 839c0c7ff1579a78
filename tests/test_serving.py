"""Serving layer: mixed-task batched decode + DynamicBatcher.

Capability beyond the reference (its `predict_action` is bs=1 HF generate,
modeling_prismatic.py:506-534): N concurrent robot-control requests for
DIFFERENT instructions coalesce into one weight-streaming decode pass, with
batch shapes padded to a fixed bucket ladder so the number of compiled
programs stays O(log max_batch) — a 7B bucket compile through the TPU relay
is minutes, so serving must never see a fresh shape on a live request.
"""

import threading
import time

import numpy as np
import pytest

from roboticattack_tpu.eval.policy import load_policy
from roboticattack_tpu.serving import DynamicBatcher, default_buckets


def _frames(n, seed=0, size=56):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8)


# ---------------------------------------------------------------- policy API
def test_get_action_multi_matches_single_task_batch():
    """A mixed-task batch row must equal the same row in a single-task batch:
    identical per-row inputs into the same jitted program (rows are
    independent through the decode — per-row true lengths, causal attention
    within rows, batched matmuls)."""
    pol = load_policy(None, model_name="vla-tiny")
    frames = _frames(2, seed=1)
    t_a, t_b = "pick up the block", "close the drawer"

    mixed = pol.get_action_multi(frames, [t_a, t_b])
    same_a = pol.get_action_batch(frames, t_a)
    same_b = pol.get_action_batch(frames, t_b)
    np.testing.assert_array_equal(mixed[0], same_a[0])
    np.testing.assert_array_equal(mixed[1], same_b[1])
    # and a degenerate mixed call IS the single-task call
    np.testing.assert_array_equal(
        pol.get_action_multi(frames, [t_a, t_a]), same_a
    )


def test_get_action_multi_validates_lengths():
    pol = load_policy(None, model_name="vla-tiny")
    with pytest.raises(ValueError, match="task labels"):
        pol.get_action_multi(_frames(2), ["one task"])


# ------------------------------------------------------------------- batcher
class StubPolicy:
    """Records batch shapes; returns row-indexed actions so tests can check
    request->result mapping through padding/reordering."""

    def __init__(self, fail=False, delay_s=0.0):
        self.calls = []
        self.fail = fail
        self.delay_s = delay_s

    def get_action_multi(self, images, tasks):
        self.calls.append((len(images), tuple(tasks)))
        if self.fail:
            raise RuntimeError("device exploded")
        if self.delay_s:
            time.sleep(self.delay_s)
        # encode the task id into the action so mapping is checkable
        return np.stack([
            np.full(7, float(t.split("#")[-1])) for t in tasks
        ])


def test_default_buckets():
    assert default_buckets(8) == (1, 2, 4, 8)
    assert default_buckets(1) == (1,)
    assert default_buckets(12) == (1, 2, 4, 8, 12)
    with pytest.raises(ValueError):
        default_buckets(0)


def test_batcher_coalesces_and_maps_results():
    stub = StubPolicy()
    with DynamicBatcher(stub, max_batch=8, max_wait_ms=100.0) as b:
        futs = [b.submit(_frames(1)[0], f"task#{i}") for i in range(5)]
        results = [f.result(timeout=30) for f in futs]
    for i, r in enumerate(results):
        np.testing.assert_array_equal(r, np.full(7, float(i)))
    # 5 requests within one wait window -> fewer batches than requests,
    # every executed batch shape is a bucket
    assert b.stats["batches"] < 5
    assert all(n in (1, 2, 4, 8) for n, _ in stub.calls), stub.calls
    assert b.stats["requests"] == 5


def test_batcher_pads_to_bucket():
    """3 simultaneous requests round up to the 4-bucket with one padded row
    (replica of row 0, output dropped)."""
    stub = StubPolicy(delay_s=0.05)
    b = DynamicBatcher(stub, max_batch=8, max_wait_ms=200.0)
    try:
        # first request opens the window; the worker soaks the other two
        futs = [b.submit(_frames(1)[0], f"task#{i}") for i in range(3)]
        out = [f.result(timeout=30) for f in futs]
    finally:
        b.close()
    np.testing.assert_array_equal(out[2], np.full(7, 2.0))
    sizes = [n for n, _ in stub.calls]
    assert sum(sizes) >= 3 and set(sizes) <= {1, 2, 4, 8}, sizes
    if sizes == [4]:  # all three soaked into one window (the common case)
        assert b.stats["padded_rows"] == 1
        assert b.bucket_counts()[4] == 1


def test_batcher_error_propagates_and_keeps_serving():
    stub = StubPolicy(fail=True)
    b = DynamicBatcher(stub, max_batch=4, max_wait_ms=5.0)
    try:
        with pytest.raises(RuntimeError, match="device exploded"):
            b.get_action(_frames(1)[0], "task#0", timeout=30)
        stub.fail = False
        np.testing.assert_array_equal(
            b.get_action(_frames(1)[0], "task#3", timeout=30), np.full(7, 3.0)
        )
        assert b.stats["errors"] == 1
    finally:
        b.close()


def test_batcher_survives_cancelled_future():
    """A caller cancel()ing its pending Future must not kill the worker
    (set_result on a cancelled future raises InvalidStateError): the request
    is dropped at claim time and later submissions still get served."""
    stub = StubPolicy(delay_s=0.3)
    b = DynamicBatcher(stub, max_batch=2, max_wait_ms=1.0)
    try:
        blocker = b.submit(_frames(1)[0], "task#0")
        time.sleep(0.1)  # worker is now inside the 0.3 s decode
        victim = b.submit(_frames(1)[0], "task#1")
        assert victim.cancel()  # still queued -> cancellable
        blocker.result(timeout=30)
        np.testing.assert_array_equal(
            b.get_action(_frames(1)[0], "task#5", timeout=30), np.full(7, 5.0)
        )
        assert victim.cancelled()
    finally:
        b.close()


def test_batcher_close_fails_pending_and_rejects_new():
    stub = StubPolicy(delay_s=0.2)
    b = DynamicBatcher(stub, max_batch=1, max_wait_ms=1.0)
    futs = [b.submit(_frames(1)[0], f"task#{i}") for i in range(3)]
    b.close()
    for f in futs:
        try:
            f.result(timeout=30)
        except RuntimeError:
            pass  # either served before close or failed by it — never hangs
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(_frames(1)[0], "task#9")


def test_batcher_end_to_end_tiny_policy():
    """Real tiny policy under concurrent mixed-task clients: every caller
    gets a finite [7] action and the worker only ever executes bucket
    shapes (= no unexpected compiles in production)."""
    pol = load_policy(None, model_name="vla-tiny")
    seen_shapes = []
    orig = pol.get_action_multi

    def spy(images, tasks):
        seen_shapes.append(len(images))
        return orig(images, tasks)

    pol.get_action_multi = spy
    b = DynamicBatcher(pol, max_batch=4, max_wait_ms=50.0)
    try:
        b.warmup(_frames(1)[0])
        results = {}

        def client(i):
            results[i] = b.get_action(
                _frames(1, seed=i)[0],
                ["pick up the block", "close the drawer"][i % 2],
                timeout=120,
            )

        threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        b.close()
    assert set(results) == set(range(6))
    for a in results.values():
        assert a.shape == (7,) and np.all(np.isfinite(a))
    assert set(seen_shapes) <= {1, 2, 4}, seen_shapes


# -------------------------------------------------------------- HTTP serving
def _post(url, payload, timeout=60):
    import json as _json
    import urllib.request

    req = urllib.request.Request(
        url, data=_json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, _json.loads(r.read())
    except Exception as e:  # urllib raises on 4xx/5xx
        if hasattr(e, "read"):
            return e.code, _json.loads(e.read())
        raise


def test_http_server_end_to_end():
    """Concurrent POST /act clients with mixed instructions + both image
    encodings; /healthz exposes the coalescing stats."""
    import base64
    import json as _json
    import urllib.request

    from roboticattack_tpu.serving.http import ActionServer

    pol = load_policy(None, model_name="vla-tiny")
    with ActionServer(pol, max_batch=4, max_wait_ms=50.0) as srv:
        host, port = srv.address
        base = f"http://{host}:{port}"
        frame = _frames(1)[0]

        def b64_payload(task):
            return {"task": task,
                    "image_b64": base64.b64encode(frame.tobytes()).decode(),
                    "shape": list(frame.shape)}

        results = {}

        def client(i):
            task = ["pick up the block", "close the drawer"][i % 2]
            payload = (b64_payload(task) if i % 2 == 0
                       else {"task": task, "image": frame.tolist()})
            results[i] = _post(base + "/act", payload, timeout=120)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i, (code, body) in results.items():
            assert code == 200, (i, body)
            assert len(body["action"]) == 7
            assert all(np.isfinite(body["action"]))

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = _json.loads(r.read())
        assert health["ok"] and health["stats"]["requests"] == 4
        assert health["stats"]["batches"] >= 1


def test_http_server_rejects_malformed():
    from roboticattack_tpu.serving.http import ActionServer

    pol = load_policy(None, model_name="vla-tiny")
    with ActionServer(pol, max_batch=2, max_wait_ms=1.0) as srv:
        host, port = srv.address
        base = f"http://{host}:{port}"
        frame = _frames(1)[0]
        # missing image
        code, body = _post(base + "/act", {"task": "x"})
        assert code == 400 and "image" in body["error"]
        # shape/bytes mismatch
        import base64 as _b64
        code, body = _post(base + "/act", {
            "task": "x",
            "image_b64": _b64.b64encode(frame.tobytes()).decode(),
            "shape": [1, 1, 3],
        })
        assert code == 400 and "bytes" in body["error"]
        # empty task
        code, body = _post(base + "/act", {"task": "", "image": frame.tolist()})
        assert code == 400
        # unknown path
        code, body = _post(base + "/nope", {"task": "x"})
        assert code == 404


def test_serve_cli_smoke():
    """The serve CLI builds, binds, and answers one request on the tiny
    model (port 0 = ephemeral; --no_warmup keeps it fast)."""
    import threading as _threading

    from roboticattack_tpu.cli import serve as serve_cli

    # drive main() with a shutdown: patch serve_forever via a port-0 server
    # is awkward from main(); instead exercise the same wiring main() uses
    args = serve_cli.build_parser().parse_args([
        "--model", "vla-tiny", "--port", "0", "--max_batch", "2",
        "--no_warmup",
    ])
    assert args.model == "vla-tiny" and args.port == 0
    from roboticattack_tpu.eval.policy import load_policy as _lp
    from roboticattack_tpu.serving.http import ActionServer

    pol = _lp(None, model_name=args.model)
    with ActionServer(pol, port=args.port, max_batch=args.max_batch) as srv:
        host, port = srv.address
        code, body = _post(
            f"http://{host}:{port}/act",
            {"task": "pick up the block", "image": _frames(1)[0].tolist()},
            timeout=120,
        )
    assert code == 200 and len(body["action"]) == 7


def test_batcher_latency_quantiles():
    """Served requests feed p50/p95/p99 submit->resolve latency (bounded to
    the last 1024 samples); empty before any request resolves."""
    stub = StubPolicy(delay_s=0.05)
    b = DynamicBatcher(stub, max_batch=4, max_wait_ms=5.0)
    try:
        assert b.latency_quantiles() == {}
        for i in range(3):
            b.get_action(_frames(1)[0], f"task#{i}", timeout=30)
        q = b.latency_quantiles()
    finally:
        b.close()
    assert q["n"] == 3
    assert 0.05 <= q["p50_s"] <= q["p95_s"] <= q["p99_s"] < 30.0


def test_http_server_400_on_non_dict_and_bad_shape_types():
    """Malformed bodies that used to raise TypeError (dropped connection)
    must come back as clean 400s: non-dict JSON, float shape entries."""
    from roboticattack_tpu.serving.http import ActionServer

    pol = load_policy(None, model_name="vla-tiny")
    with ActionServer(pol, max_batch=2, max_wait_ms=1.0) as srv:
        host, port = srv.address
        base = f"http://{host}:{port}"
        code, body = _post(base + "/act", [1, 2, 3])
        assert code == 400 and "JSON object" in body["error"]
        import base64 as _b64
        frame = _frames(1)[0]
        code, body = _post(base + "/act", {
            "task": "x",
            "image_b64": _b64.b64encode(frame.tobytes()).decode(),
            "shape": [56.0, "56", 3],
        })
        assert code == 400


# ------------------------------------------------------- Jacobi draft serving
def test_batcher_drafts_round_trip():
    """drafts=True: submit_full returns ActResult(action, tokens); feeding
    the tokens back as the next request's draft gives the same action (exact
    greedy fixed point) and records verify-pass stats. Plain submit() on a
    drafts batcher keeps returning the bare action (zero draft internally)."""
    pol = load_policy(None, model_name="vla-tiny")
    b = DynamicBatcher(pol, max_batch=2, max_wait_ms=5.0, drafts=True)
    try:
        b.warmup(_frames(1)[0])
        frame = _frames(1, seed=3)[0]
        first = b.submit_full(frame, "stack the cups").result(timeout=120)
        assert first.tokens is not None and first.tokens.shape == (7,)
        second = b.submit_full(
            frame, "stack the cups", draft_tokens=first.tokens
        ).result(timeout=120)
        np.testing.assert_array_equal(first.action, second.action)
        np.testing.assert_array_equal(first.tokens, second.tokens)
        stats = b.verify_pass_stats()
        assert stats and stats["n"] >= 2 and stats["max"] <= 6

        plain = b.get_action(frame, "stack the cups", timeout=120)
        np.testing.assert_array_equal(plain, first.action)
    finally:
        b.close()


def test_submit_full_draft_needs_drafts_mode():
    """A draft on a drafts=False batcher must fail loudly at submit time (the
    Jacobi program was never warmed — compiling it on a live request is the
    exact failure mode the batcher exists to prevent); draftless submit_full
    still resolves to an ActResult."""
    b = DynamicBatcher(StubPolicy(), max_batch=2, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="drafts=True"):
            b.submit_full(_frames(1)[0], "task#0", draft_tokens=np.zeros(7))
        with pytest.raises(ValueError, match="7 token ids"):
            b.submit_full(_frames(1)[0], "task#0", draft_tokens=np.zeros(3))
        res = b.submit_full(_frames(1)[0], "task#1").result(timeout=30)
        np.testing.assert_array_equal(res.action, np.full(7, 1.0))
        assert res.tokens is None  # StubPolicy has no last_tokens
    finally:
        b.close()


def test_http_drafts_protocol():
    """Drafts-enabled server: responses carry 'tokens', the client round-trips
    them as 'draft_tokens', /healthz exposes verify-pass stats; a plain
    server 400s on draft_tokens instead of silently ignoring them."""
    import json as _json
    import urllib.request

    from roboticattack_tpu.serving.http import ActionServer

    pol = load_policy(None, model_name="vla-tiny")
    frame = _frames(1, seed=5)[0]
    with ActionServer(pol, max_batch=2, max_wait_ms=5.0, drafts=True) as srv:
        host, port = srv.address
        base = f"http://{host}:{port}"
        payload = {"task": "wipe the table", "image": frame.tolist()}
        code, body = _post(base + "/act", payload, timeout=120)
        assert code == 200 and len(body["tokens"]) == 7

        code, body2 = _post(
            base + "/act", dict(payload, draft_tokens=body["tokens"]),
            timeout=120,
        )
        assert code == 200
        assert body2["action"] == body["action"]

        code, bad = _post(
            base + "/act", dict(payload, draft_tokens=[1, 2, 3]), timeout=60
        )
        assert code == 400 and "7 ints" in bad["error"]

        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            health = _json.loads(r.read())
        assert health["verify_passes"]["n"] >= 2

    with ActionServer(pol, max_batch=2, max_wait_ms=1.0) as srv:
        host, port = srv.address
        code, body = _post(
            f"http://{host}:{port}/act",
            dict(payload, draft_tokens=[0] * 7), timeout=60,
        )
        assert code == 400 and "drafts" in body["error"]
