"""Multi-host sharded video: 2 real processes over jax.distributed.

The reference has no distributed story (SURVEY.md §2.3); this framework
shards orbit frames across every host's chips with zero cross-host
traffic during rendering (bhr_tpu/parallel/video.py). These tests run
the REAL multi-controller path — two OS processes, a coordination
service on localhost, 2 virtual CPU devices per process — and verify:
every frame PNG lands on disk exactly once, process 0 owns
progress.json and the assembled video, and the frames are bitwise
identical to a single-process render of the same scene.
"""

import json
import os
import subprocess
import sys
import socket
import time

import numpy as np
import pytest

# Fleet tier (see pyproject markers): multi-process jax.distributed
# runs, excluded from both the core ("not slow") and the bounded
# ("not fleet") suites — doubly marked so the long-standing
# `-m "not slow"` core invocation keeps excluding these too.
pytestmark = [pytest.mark.slow, pytest.mark.fleet]

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# 9 frames over a 4-device x 2-frames batch of 8: the second batch is 1
# real frame + 7 padding repeats, so the multi-host padding-skip path
# (positions landing on the OTHER host's devices) is exercised.
N_FRAMES = 9

WORKER = """
import dataclasses, os, sys
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from bhr_tpu.parallel.mesh import initialize_multihost
n = initialize_multihost("127.0.0.1:" + port, 2, pid)
assert n == 2, n
assert jax.device_count() == 4, jax.device_count()
assert jax.process_index() == pid
from bhr_tpu.config import SceneConfig
from bhr_tpu.parallel.video import render_video_sharded
# Pin dispatch sizing: this test's padding-skip coverage needs the
# 9-frames-over-batch-of-8 layout, not the adaptive (single-batch)
# sizing a 32x16 scene would get.
cfg = SceneConfig(
    width=32, height=16, fov=60.0, step_size=0.2,
    disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
    orbit=True, video=True, n_frames={n_frames}, fps=4, n_stars=64,
    frames_per_dispatch=2,
    output=os.path.join(outdir, "mh.mp4"),
).validated()
render_video_sharded(cfg)
# Second pass with resume=True: everything is complete, so this drives
# the broadcast resume arbitration (process 0 -> fleet) and idempotent
# reassembly without re-rendering a single frame.
render_video_sharded(dataclasses.replace(cfg, resume=True))
# V2 volume model through the SAME fleet: multi-host admits both disk
# models (sharded_video_eligible), and the V2 per-frame program is a
# pure function of (camera, t) so it shards multi-host identically.
v2_cfg = dataclasses.replace(
    cfg, disk_model="v2", n_frames=4, frames_per_dispatch=1,
    output=os.path.join(outdir, "mh_v2.mp4"),
)
render_video_sharded(v2_cfg)
print("WORKER_OK", pid, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def multihost_run(tmp_path_factory):
    """Run the 2-process multi-host video once; tests inspect results."""
    root = tmp_path_factory.mktemp("mh")
    outdir = root / "out"
    outdir.mkdir()
    # Pre-warm the skybox cache (keyed by size/seed/n_stars) so the two
    # workers load instead of both generating; the workers share cwd.
    cwd = root / "work"
    cwd.mkdir()
    sys.path.insert(0, REPO)
    try:
        from bhr_tpu.models.skybox import load_or_generate_skybox

        load_or_generate_skybox(
            None, 2048, 1024, 64, seed=42,
            cache_dir=str(cwd / "output" / ".skybox_cache"),
        )
    finally:
        sys.path.pop(0)

    script = root / "worker.py"
    script.write_text(WORKER.format(n_frames=N_FRAMES))
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # The conftest's 8-device XLA_FLAGS must not leak into the workers
    # (they set their own 2-device flag before importing jax).
    env.pop("XLA_FLAGS", None)
    # Worker output goes to files, not pipes: with sequential waits, a
    # worker filling a 64KB pipe buffer would block mid-collective and
    # deadlock both processes until the timeout, masking the real error.
    logs = [root / f"worker{pid}.log" for pid in (0, 1)]
    procs = []
    for pid in (0, 1):
        with open(logs[pid], "w") as log:
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(pid), port, str(outdir)],
                cwd=str(cwd), env=env, stdout=log, stderr=log,
            ))
    deadline = time.time() + 540
    for p in procs:
        try:
            p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    outs = [log.read_text() for log in logs]
    return outdir, procs, outs


def _temp_dir(outdir) -> str:
    # The product's own derivation — a hand-rolled md5 copy here would
    # go stale if video_temp_paths ever changes its key scheme.
    from bhr_tpu.modes import video_temp_paths

    return video_temp_paths(str(outdir / "mh.mp4"))[0]


def test_both_workers_succeed(multihost_run):
    outdir, procs, outs = multihost_run
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_OK {pid}" in out


def test_all_frames_written_and_video_assembled(multihost_run):
    outdir, _, _ = multihost_run
    temp_dir = _temp_dir(outdir)
    pngs = sorted(f for f in os.listdir(temp_dir) if f.endswith(".png"))
    assert pngs == [f"frame_{f:04d}.png" for f in range(N_FRAMES)]
    video = outdir / "mh.mp4"
    assert video.is_file() and video.stat().st_size > 0
    with open(os.path.join(temp_dir, "progress.json")) as f:
        progress = json.load(f)
    assert sorted(progress["completed"]) == list(range(N_FRAMES))


def test_frames_match_single_process(multihost_run):
    """Bitwise frame identity: the multi-controller render is the same
    jitted program, so CPU frames must match a single-process render.

    Bit-equality holds only for identical PER-DEVICE batch shapes (a
    different frames-per-device count compiles a different lax.map
    program, whose fusion can differ by 1 ULP — enough to flip a uint8
    pixel after rounding), so this pins the same dispatch sizing the
    multihost workers used.
    """
    from PIL import Image

    from bhr_tpu.config import SceneConfig
    from bhr_tpu.parallel.video import render_video_sharded

    outdir, _, _ = multihost_run
    sp_out = outdir / "sp"
    sp_out.mkdir()
    cfg = SceneConfig(
        width=32, height=16, fov=60.0, step_size=0.2,
        disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
        orbit=True, video=True, n_frames=N_FRAMES, fps=4, n_stars=64,
        frames_per_dispatch=2,
        output=str(sp_out / "sp.mp4"),
    ).validated()
    render_video_sharded(cfg)

    from bhr_tpu.modes import video_temp_paths

    mh_dir = _temp_dir(outdir)
    sp_dir = video_temp_paths(str(sp_out / "sp.mp4"))[0]
    for f in range(N_FRAMES):
        name = f"frame_{f:04d}.png"
        a = np.asarray(Image.open(os.path.join(mh_dir, name)))
        b = np.asarray(Image.open(os.path.join(sp_dir, name)))
        np.testing.assert_array_equal(a, b, err_msg=name)


def test_v2_multihost_frames_match_single_process(multihost_run):
    """The V2 volume model through the multi-host fleet renders the
    same frames as a single-process V2 run (same per-device batch
    shape, so bitwise)."""
    from PIL import Image

    from bhr_tpu.config import SceneConfig
    from bhr_tpu.modes import video_temp_paths
    from bhr_tpu.parallel.video import render_video_sharded

    outdir, _, _ = multihost_run
    assert os.path.getsize(outdir / "mh_v2.mp4") > 0
    sp_out = outdir / "sp_v2"
    sp_out.mkdir()
    cfg = SceneConfig(
        width=32, height=16, fov=60.0, step_size=0.2,
        disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
        disk_model="v2", orbit=True, video=True, n_frames=4, fps=4,
        n_stars=64, frames_per_dispatch=1, frame_shards=4,
        output=str(sp_out / "sp.mp4"),
    ).validated()
    render_video_sharded(cfg)
    mh_dir = video_temp_paths(str(outdir / "mh_v2.mp4"))[0]
    sp_dir = video_temp_paths(str(sp_out / "sp.mp4"))[0]
    for f in range(4):
        name = f"frame_{f:04d}.png"
        a = np.asarray(Image.open(os.path.join(mh_dir, name)))
        b = np.asarray(Image.open(os.path.join(sp_dir, name)))
        np.testing.assert_array_equal(a, b, err_msg=name)


GUARD_WORKER = """
import sys
pid, port = int(sys.argv[1]), sys.argv[2]
from bhr_tpu.cli import main
# Unsupported multi-host mode (no --video): every process must reject
# it after the fleet connects, instead of running duplicated renders.
main(["--device", "cpu", "--interactive", "-r", "sd", "-o", "x.png",
      "--coordinator_address", "127.0.0.1:" + port,
      "--num_processes", "2", "--process_id", str(pid)])
"""


def test_multihost_rejects_unsupported_mode(tmp_path):
    """Both processes of a fleet running a non-sharded-video mode exit
    with the argparse error code (cli.py multi-host mode guard)."""
    script = tmp_path / "guard_worker.py"
    script.write_text(GUARD_WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    logs = [tmp_path / f"guard{pid}.log" for pid in (0, 1)]
    procs = []
    for pid in (0, 1):
        with open(logs[pid], "w") as log:
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(pid), port],
                cwd=str(tmp_path), env=env, stdout=log, stderr=log,
            ))
    deadline = time.time() + 180
    for p in procs:
        try:
            p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for pid, (p, log) in enumerate(zip(procs, logs)):
        out = log.read_text()
        assert p.returncode == 2, f"guard worker {pid}: rc={p.returncode}\n{out[-2000:]}"
        assert "sharded orbit video" in out, out[-2000:]


FAIL_WORKER = """
import os, sys
pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from bhr_tpu.parallel.mesh import initialize_multihost
# Short heartbeat so the survivor notices the dead peer in seconds,
# not the 100 s default.
initialize_multihost("127.0.0.1:" + port, 2, pid,
                     heartbeat_timeout_seconds=10)
import bhr_tpu.parallel.video as V
real = V.render_video_frames_sharded
calls = [0]
def inject(*a, **kw):
    calls[0] += 1
    if pid == 1 and calls[0] == 2:
        raise RuntimeError("injected-batch-failure")
    return real(*a, **kw)
V.render_video_frames_sharded = inject
from bhr_tpu.config import SceneConfig

cfg = SceneConfig(
    width=32, height=16, fov=60.0, step_size=0.2,
    disk_inner_radius=2.0, disk_outer_radius=3.5, disk_tilt=15.0,
    orbit=True, video=True, n_frames=16, fps=4, n_stars=64,
    frames_per_dispatch=2,  # failure must land on a SECOND batch
    output=os.path.join(outdir, "fail.mp4"),
).validated()
V.render_video_sharded(cfg)
print("UNREACHABLE", pid, flush=True)
"""


def test_fleet_aborts_on_worker_failure(tmp_path):
    """A worker that dies mid-run must take the whole fleet down loudly
    (video.py _abort_fleet_on_error) — the failure mode it prevents is
    the survivor blocking in sync_global_devices forever."""
    outdir = tmp_path / "out"
    outdir.mkdir()
    script = tmp_path / "fail_worker.py"
    script.write_text(FAIL_WORKER)
    port = str(_free_port())
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    logs = [tmp_path / f"fail{pid}.log" for pid in (0, 1)]
    procs = []
    for pid in (0, 1):
        with open(logs[pid], "w") as log:
            procs.append(subprocess.Popen(
                [sys.executable, str(script), str(pid), port, str(outdir)],
                cwd=str(tmp_path), env=env, stdout=log, stderr=log,
            ))
    # Worker 1 injects a failure on its second batch; worker 0 must
    # exit (via the coordination service's dead-peer detection) well
    # within this deadline instead of hanging in the batch barrier.
    deadline = time.time() + 240
    for p in procs:
        try:
            p.wait(timeout=max(1, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("fleet hung after a worker death — the abort "
                        "path did not fire")
    out1 = logs[1].read_text()
    assert procs[1].returncode == 1, out1[-2000:]
    assert "injected-batch-failure" in out1
    assert "aborting the fleet" in out1
    out0 = logs[0].read_text()
    assert procs[0].returncode != 0, out0[-2000:]
    assert "UNREACHABLE" not in out0
    assert "UNREACHABLE" not in out1
