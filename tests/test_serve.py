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
