"""seg_serve: warm-session serving over the JSON socket protocol.

Protocol-level tests run the real server (accept loop + sockets) in a
daemon thread against a tiny random-weight model — the session cache makes
the second request reuse every compiled program, which is the point of the
server existing (BASELINE.md session-reuse measurement)."""
import json
import os
import socket
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation3d_tpu.core.serve import (SegmentationServer, request,
                                           serve_forever)
from segmentation3d_tpu.io import Volume, read_image, write_image
from segmentation3d_tpu.models.vnet import SegmentationNet
from segmentation3d_tpu.ops.geometry import Frame
from segmentation3d_tpu.utils import model_io
from segmentation3d_tpu.utils.normalizer import FixedNormalizer

import pytest as _pytest
pytestmark = _pytest.mark.slow  # expensive integration tier (VERDICT r4 #7)


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A live server (unix socket) over a tiny model + one phantom case."""
    root = tmp_path_factory.mktemp("serve")
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
    variables = jax.device_get(net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)), train=False))
    model_dir = str(root / "model")
    model_io.save_checkpoint(
        model_dir, 0, 0, variables, net_name="vnet", max_stride=16,
        in_channels=1, out_channels=2, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR",
        crop_normalizers=[FixedNormalizer(mean=0.0, stddev=1.0)],
        extra={"net_kwargs": {"base_channels": 2}})

    rng = np.random.default_rng(3)
    img = rng.normal(0.0, 1.0, (24, 24, 24)).astype(np.float32)
    case = str(root / "case.nii.gz")
    write_image(Volume(img, Frame.identity()), case)

    from segmentation3d_tpu.core.seg_infer import segmentation

    def run_fn(input_path, output_dir, seg_name, save_image, save_prob):
        return segmentation(input_path, model_dir, output_dir,
                            seg_name=seg_name, save_image=save_image,
                            save_prob=save_prob, batch_size=1,
                            shape_bucket=16)

    server = SegmentationServer(run_fn, model_dir, seg_name="seg.nii.gz")
    sock = str(root / "seg.sock")
    t = threading.Thread(target=serve_forever, daemon=True,
                         kwargs=dict(server=server, socket_path=sock,
                                     log=None))
    t.start()
    for _ in range(200):  # wait for bind
        if os.path.exists(sock):
            break
        t.join(0.05)
    assert os.path.exists(sock)
    yield root, case, sock, server
    if t.is_alive():
        try:
            request(sock, {"cmd": "shutdown"}, timeout=10)
        except OSError:
            pass
        t.join(10)


def test_ping(served):
    _, _, sock, _ = served
    r = request(sock, {"cmd": "ping"})
    assert r["ok"] and r["pong"] and "uptime_s" in r


def test_segment_and_warm_repeat(served):
    root, case, sock, server = served
    r1 = request(sock, {"input": case, "output_dir": str(root / "o1")})
    assert r1["ok"], r1
    assert r1["results"][0][0] == "case"
    out = os.path.join(str(root / "o1"), "case", "seg.nii.gz")
    assert os.path.isfile(out)
    pred = read_image(out).data
    assert pred.shape == (24, 24, 24)

    # warm repeat: same programs, new output dir, per-request seg_name
    before = server.served
    r2 = request(sock, {"input": case, "output_dir": str(root / "o2"),
                        "seg_name": "mask.nii.gz"})
    assert r2["ok"], r2
    assert os.path.isfile(os.path.join(str(root / "o2"), "case",
                                       "mask.nii.gz"))
    assert server.served == before + 1
    a = read_image(out).data
    b = read_image(os.path.join(str(root / "o2"), "case", "mask.nii.gz")).data
    np.testing.assert_array_equal(a, b)


def test_per_request_isolation(served):
    """Bad requests answer ok=false and the server keeps serving."""
    root, case, sock, _ = served
    r = request(sock, {"output_dir": str(root / "bad")})  # missing input
    assert not r["ok"] and "input" in r["error"]
    r = request(sock, {"input": case, "output_dir": str(root / "bad"),
                       "partition_type": "SLAB"})  # engine opts are fixed
    assert not r["ok"] and "partition_type" in r["error"]
    r = request(sock, {"cmd": "nope"})
    assert not r["ok"]
    r = request(sock, {"input": str(root / "missing.nii.gz"),
                       "output_dir": str(root / "bad")})
    assert not r["ok"]
    assert request(sock, {"cmd": "ping"})["ok"]  # still alive


def test_bad_json_line(served):
    _, _, sock, _ = served
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    with c:
        c.connect(sock)
        c.sendall(b"{not json\n")
        line = c.makefile("r").readline()
    r = json.loads(line)
    assert not r["ok"] and "bad JSON" in r["error"]


def test_tcp_mode_and_shutdown():
    """TCP transport: ephemeral port, ping, shutdown ends the accept loop."""
    server = SegmentationServer(lambda *a: [], "none")
    got = {}
    ev = threading.Event()

    def ready(addr):
        got["addr"] = addr
        ev.set()

    t = threading.Thread(target=serve_forever, daemon=True,
                         kwargs=dict(server=server, host="127.0.0.1", port=0,
                                     ready=ready, log=None))
    t.start()
    assert ev.wait(10)
    addr = got["addr"]
    assert request(addr, {"cmd": "ping"})["ok"]
    r = request(addr, {"cmd": "shutdown"})
    assert r["ok"] and r["shutdown"]
    t.join(10)
    assert not t.is_alive()


def _echo_server(tmpdir, name="h.sock", **kw):
    """A live trivial server on a unix socket; returns (sock_path, thread)."""
    server = SegmentationServer(lambda *a: [], "none")
    sock = os.path.join(str(tmpdir), name)
    t = threading.Thread(target=serve_forever, daemon=True,
                         kwargs=dict(server=server, socket_path=sock,
                                     log=None, **kw))
    t.start()
    for _ in range(200):
        if os.path.exists(sock):
            break
        t.join(0.05)
    assert os.path.exists(sock)
    return sock, t


def test_idle_client_dropped_not_wedged(tmp_path):
    """A client that connects and sends nothing is dropped after
    idle_timeout; other clients keep being served (the wedged-client
    scenario — connections are handled serially)."""
    sock, t = _echo_server(tmp_path, idle_timeout=0.5)
    try:
        wedge = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        wedge.connect(sock)  # sends nothing
        try:
            # the next client must get through once the wedge is dropped
            r = request(sock, {"cmd": "ping"}, timeout=10)
            assert r["ok"]
        finally:
            wedge.close()
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_oversized_request_rejected(tmp_path):
    """A request line above max_request_bytes answers an error and drops the
    connection instead of buffering it."""
    sock, t = _echo_server(tmp_path, max_request_bytes=1024)
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        with c:
            c.settimeout(10)
            c.connect(sock)
            c.sendall(b'{"input": "' + b"x" * 4096 + b'"}\n')
            line = c.makefile("r").readline()
        r = json.loads(line)
        assert not r["ok"] and "exceeds" in r["error"]
        assert request(sock, {"cmd": "ping"}, timeout=10)["ok"]  # still alive
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_live_socket_not_stolen(tmp_path):
    """A second server refuses to bind over a LIVE server's unix socket; a
    STALE socket file (dead server) is cleaned up and reused."""
    from segmentation3d_tpu.core.serve import _bind
    sock, t = _echo_server(tmp_path)
    try:
        with pytest.raises(OSError, match="already listening"):
            _bind(sock, None, None)
        assert request(sock, {"cmd": "ping"}, timeout=10)["ok"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)
    # dead server leaves no socket (serve_forever unlinks on exit); simulate
    # a crash-stale path: bind and abandon without accept loop
    stale = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    stale_path = os.path.join(str(tmp_path), "stale.sock")
    stale.bind(stale_path)
    stale.close()  # closed without listen/accept: connects now fail
    srv, addr = _bind(stale_path, None, None)
    srv.close()
    os.unlink(stale_path)


def test_cli_wiring():
    """seg_serve main() builds and serves over a unix socket end-to-end
    (tiny whole-volume run through the real CLI arg surface)."""
    import tempfile

    from segmentation3d_tpu.cli.seg_serve import main
    with tempfile.TemporaryDirectory() as td:
        net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
        variables = jax.device_get(net.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 1)),
            train=False))
        model_dir = os.path.join(td, "model")
        model_io.save_checkpoint(
            model_dir, 0, 0, variables, net_name="vnet", max_stride=16,
            in_channels=1, out_channels=2, spacing=[1.0, 1.0, 1.0],
            interpolation="LINEAR",
            crop_normalizers=[FixedNormalizer(mean=0.0, stddev=1.0)],
            extra={"net_kwargs": {"base_channels": 2}})
        img = np.zeros((16, 16, 16), np.float32)
        case = os.path.join(td, "c.nii.gz")
        write_image(Volume(img, Frame.identity()), case)
        sock = os.path.join(td, "s.sock")
        t = threading.Thread(
            target=main, daemon=True,
            args=(["-m", model_dir, "--socket", sock, "-n", "seg.nii.gz",
                   "--batch_size", "1"],))
        t.start()
        for _ in range(400):
            if os.path.exists(sock):
                break
            t.join(0.05)
        assert os.path.exists(sock)
        r = request(sock, {"input": case, "output_dir": os.path.join(td, "o")})
        assert r["ok"], r
        assert os.path.isfile(os.path.join(td, "o", "c", "seg.nii.gz"))
        assert request(sock, {"cmd": "shutdown"})["ok"]
        t.join(10)
        assert not t.is_alive()

    # exactly one of --socket/--port is enforced
    with pytest.raises(SystemExit):
        main(["-m", "x"])


def test_idle_timeout_zero_means_no_timeout(tmp_path):
    """--idle_timeout 0 must DISABLE the timeout (settimeout(0) would mean
    non-blocking and drop every client instantly)."""
    import time
    sock, t = _echo_server(tmp_path, name="z.sock", idle_timeout=0)
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        with c:
            c.settimeout(10)
            c.connect(sock)
            time.sleep(0.3)  # dawdle before sending — must not be dropped
            c.sendall(b'{"cmd": "ping"}\n')
            line = c.makefile("r").readline()
        assert json.loads(line)["ok"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_exact_max_request_bytes_accepted(tmp_path):
    """A payload of EXACTLY max_request_bytes (plus its newline) is served;
    max+1 is rejected."""
    sock, t = _echo_server(tmp_path, name="m.sock", max_request_bytes=64)
    try:
        body = '{"cmd": "ping"}'
        line = body + " " * (64 - len(body))
        assert len(line) == 64
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        with c:
            c.settimeout(10)
            c.connect(sock)
            c.sendall(line.encode() + b"\n")
            r = json.loads(c.makefile("r").readline())
        assert r["ok"], r
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        with c:
            c.settimeout(10)
            c.connect(sock)
            c.sendall(b" " * 65 + b"{}\n")
            r = json.loads(c.makefile("r").readline())
        assert not r["ok"] and "exceeds" in r["error"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_serve_coarse_to_fine_wiring(tmp_path):
    """seg_serve --fine_model serves the round-4 c2f driver surface
    (save_prob + post pass through; engine options fixed at start)."""
    from segmentation3d_tpu.cli.seg_serve import main as serve_main
    net = SegmentationNet(in_channels=1, out_channels=2, base_channels=2)
    variables = jax.device_get(net.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 16, 16, 16, 1)), train=False))
    model_dir = str(tmp_path / "model")
    model_io.save_checkpoint(
        model_dir, 0, 0, variables, net_name="vnet", max_stride=16,
        in_channels=1, out_channels=2, spacing=[1.0, 1.0, 1.0],
        interpolation="LINEAR",
        crop_normalizers=[FixedNormalizer(mean=0.0, stddev=1.0)],
        extra={"net_kwargs": {"base_channels": 2}})
    img = np.random.default_rng(0).normal(0, 1, (24, 24, 24)).astype(
        np.float32)
    case = str(tmp_path / "c.nii.gz")
    write_image(Volume(img, Frame.identity()), case)
    sock = str(tmp_path / "c2f.sock")
    t = threading.Thread(
        target=serve_main, daemon=True,
        args=(["-m", model_dir, "--fine_model", model_dir, "--socket", sock,
               "-n", "seg.nii.gz", "--partition_size", "16", "16", "16",
               "--batch_size", "1", "--post", "largest_cc"],))
    t.start()
    for _ in range(400):
        if os.path.exists(sock):
            break
        t.join(0.05)
    assert os.path.exists(sock)
    try:
        r = request(sock, {"input": case, "output_dir": str(tmp_path / "o"),
                           "save_prob": True}, timeout=300)
        assert r["ok"], r
        out_dir = os.path.join(str(tmp_path / "o"), "c")
        assert os.path.isfile(os.path.join(out_dir, "seg.nii.gz"))
        assert os.path.isfile(os.path.join(out_dir, "prob_0.mha"))
        # probabilities are a distribution everywhere (ROI fill fix)
        p0 = read_image(os.path.join(out_dir, "prob_0.mha")).data
        p1 = read_image(os.path.join(out_dir, "prob_1.mha")).data
        np.testing.assert_allclose(p0 + p1, 1.0, atol=0.05)
    finally:
        assert request(sock, {"cmd": "shutdown"})["ok"]
        t.join(10)
    # --spatial_shard is rejected with --fine_model (parity with seg_infer)
    with pytest.raises(SystemExit):
        serve_main(["-m", model_dir, "--fine_model", model_dir,
                    "--socket", sock, "--spatial_shard"])


# ---------------------------------------------------------------------------
# round-5 request pipelining (VERDICT round-4 weak #3): prep of the NEXT
# queued request overlaps the current one's execution; device execution
# stays single-flight FIFO with per-request isolation
# ---------------------------------------------------------------------------


def _pipelined_server(tmp_path, run_fn, prep_fn, idle_timeout=30.0):
    server = SegmentationServer(run_fn, "fake")
    sock = str(tmp_path / "p.sock")
    t = threading.Thread(target=serve_forever, daemon=True,
                         kwargs=dict(server=server, socket_path=sock,
                                     log=None, prep_fn=prep_fn,
                                     idle_timeout=idle_timeout))
    t.start()
    for _ in range(200):
        if os.path.exists(sock):
            break
        t.join(0.05)
    assert os.path.exists(sock)
    return server, sock, t


def test_burst_overlaps_prep_with_execution(tmp_path):
    """3-request burst with prep=0.4s (host) and run=0.4s (device):
    pipelined wall is ~prep + 3*run, well under the serial 3*(prep+run)
    (the round-5 A/B done-criterion, with sleeps standing in for host
    read/decode/upload and device compute)."""
    import time as _time
    events = []

    def prep_fn(req):
        _time.sleep(0.4)
        events.append(("prep", req["input"]))
        return f"prepared:{req['input']}"

    def run_fn(input_path, output_dir, seg_name, save_image, save_prob,
               prepared=None):
        assert prepared == f"prepared:{input_path}"
        _time.sleep(0.4)
        events.append(("run", input_path))
        return [(input_path, 0.4)]

    server, sock, t = _pipelined_server(tmp_path, run_fn, prep_fn)
    try:
        results = [None] * 3
        def client(i):
            results[i] = request(sock, {"input": f"in{i}",
                                        "output_dir": str(tmp_path)})
        t0 = _time.time()
        # stagger slightly so arrival (and FIFO) order is deterministic
        threads = []
        for i in range(3):
            th = threading.Thread(target=client, args=(i,))
            th.start()
            threads.append(th)
            _time.sleep(0.05)
        for th in threads:
            th.join(15)
        wall = _time.time() - t0
        assert all(r is not None and r["ok"] for r in results), results
        # serial would be >= 3 * 0.8 = 2.4; pipelined ~0.4 + 3*0.4 = 1.6
        assert wall < 2.1, f"burst took {wall:.2f}s — prep did not overlap"
        # single-flight: runs never interleave (each run's entry is complete
        # before the next), and FIFO order holds
        run_order = [e[1] for e in events if e[0] == "run"]
        assert run_order == ["in0", "in1", "in2"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_ordering_and_isolation_same_connection(tmp_path):
    """Several requests on ONE connection answer in order even when one in
    the middle fails (per-request isolation under overlap)."""
    def prep_fn(req):
        if req["input"] == "bad-prep":
            raise RuntimeError("prep exploded")
        return "ok"

    def run_fn(input_path, output_dir, seg_name, save_image, save_prob,
               prepared=None):
        if input_path == "bad-run":
            raise RuntimeError("run exploded")
        return [(input_path, 0.0)]

    server, sock, t = _pipelined_server(tmp_path, run_fn, prep_fn)
    try:
        c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        with c:
            c.connect(sock)
            payload = b"".join(
                json.dumps({"input": name, "output_dir": str(tmp_path)})
                .encode() + b"\n"
                for name in ["a", "bad-prep", "bad-run", "b"])
            c.sendall(payload)
            rf = c.makefile("r")
            lines = [json.loads(rf.readline()) for _ in range(4)]
        assert lines[0]["ok"] and lines[0]["results"][0][0] == "a"
        assert not lines[1]["ok"] and "prep exploded" in lines[1]["error"]
        assert not lines[2]["ok"] and "run exploded" in lines[2]["error"]
        assert lines[3]["ok"] and lines[3]["results"][0][0] == "b"
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_ping_immediate_during_long_request(tmp_path):
    """A health-check ping answers while a segmentation runs (it no longer
    queues behind the device)."""
    import time as _time
    gate = threading.Event()

    def run_fn(input_path, output_dir, seg_name, save_image, save_prob,
               prepared=None):
        gate.wait(10)
        return [(input_path, 0.0)]

    server, sock, t = _pipelined_server(tmp_path, run_fn, None)
    try:
        resp = [None]
        def client():
            resp[0] = request(sock, {"input": "x",
                                     "output_dir": str(tmp_path)})
        th = threading.Thread(target=client)
        th.start()
        _time.sleep(0.2)  # the request is now executing (blocked on gate)
        t0 = _time.time()
        r = request(sock, {"cmd": "ping"}, timeout=5)
        assert r["ok"] and r["pong"]
        assert _time.time() - t0 < 2.0
        gate.set()
        th.join(10)
        assert resp[0]["ok"]
    finally:
        request(sock, {"cmd": "shutdown"}, timeout=10)
        t.join(10)


def test_shutdown_queues_fifo_behind_requests(tmp_path):
    """Requests sent before shutdown still run; the server exits after."""
    import time as _time
    ran = []

    def run_fn(input_path, output_dir, seg_name, save_image, save_prob,
               prepared=None):
        _time.sleep(0.2)
        ran.append(input_path)
        return [(input_path, 0.2)]

    server, sock, t = _pipelined_server(tmp_path, run_fn, None)
    results = [None, None]
    def client(i):
        results[i] = request(sock, {"input": f"q{i}",
                                    "output_dir": str(tmp_path)})
    ths = []
    for i in range(2):
        th = threading.Thread(target=client, args=(i,))
        th.start()
        ths.append(th)
        _time.sleep(0.05)
    _time.sleep(0.05)
    r = request(sock, {"cmd": "shutdown"}, timeout=10)
    assert r["ok"] and r.get("shutdown")
    for th in ths:
        th.join(10)
    t.join(10)
    assert not t.is_alive()
    assert ran == ["q0", "q1"]
    assert all(x is not None and x["ok"] for x in results), results


def test_prepared_input_drives_real_segmentation(served, tmp_path):
    """prepare_cases -> segmentation(prepared=...) is the exact driver path
    the serving prep stage uses: results match the unprepared call, and a
    mismatched input raises."""
    root, case, sock, server = served
    from segmentation3d_tpu.core.seg_infer import prepare_cases, segmentation
    prep = prepare_cases(case)
    out1 = str(tmp_path / "p1")
    model_dir = server.model_dir
    r1 = segmentation(case, model_dir, out1, seg_name="seg.nii.gz",
                      batch_size=1, shape_bucket=16, prepared=prep)
    assert len(r1) == 1
    out2 = str(tmp_path / "p2")
    r2 = segmentation(case, model_dir, out2, seg_name="seg.nii.gz",
                      batch_size=1, shape_bucket=16)
    a = read_image(os.path.join(out1, r1[0][0], "seg.nii.gz")).data
    b = read_image(os.path.join(out2, r2[0][0], "seg.nii.gz")).data
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="prepared input"):
        segmentation("other.nii.gz", model_dir, out2,
                     prepared=prepare_cases(case))
