"""Host-side tests for bench.py's section orchestration: the tagged-line
protocol (SECTION_JSON merge order), timeout salvage of flushed partial
output, and the child CLI dispatch. No jax / no device — these guard the
machinery that decides whether a round gets its numbers at all (round-3
lesson: an in-process fault ate two of three sections; round-4 lesson:
tunnel stall windows eat whole child processes unless flushed tagged lines
are salvaged)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def _fake_child(monkeypatch, script: str):
    """Route bench._run_section's child invocation to an inline script that
    fakes a section process (prints tagged lines, exits / hangs)."""
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        return real_run([sys.executable, "-u", "-c", script], **kw)

    monkeypatch.setattr(subprocess, "run", fake_run)


def test_merges_tagged_lines_in_print_order(monkeypatch):
    _fake_child(monkeypatch, r"""
print('SECTION_JSON {"full_xrt": 10.0, "stream_xrt": 100.0}', flush=True)
print('SECTION_JSON {"train_steps_per_sec": 15.7}', flush=True)
print('SECTION_JSON {"train_steps_per_sec": 15.9, "graph_xrt": 280.0}', flush=True)
""")
    rec, err = bench._run_section("all", [], 30.0)
    assert err is None
    # later lines add keys; re-prints overwrite with the fuller record
    assert rec == {"full_xrt": 10.0, "stream_xrt": 100.0,
                   "train_steps_per_sec": 15.9, "graph_xrt": 280.0}


def test_timeout_salvages_flushed_lines(monkeypatch):
    _fake_child(monkeypatch, r"""
print('SECTION_JSON {"full_xrt": 10.0, "stream_xrt": 100.0}', flush=True)
import time; time.sleep(300)
""")
    # generous cap: under a loaded 1-core host the interpreter can take
    # seconds to start — the test needs the print to flush before the cap
    rec, err = bench._run_section("all", [], 20.0)
    assert err is None  # partial result returned, not an error
    assert rec["stream_xrt"] == 100.0
    assert "timed out" in rec["partial_error"]


def test_timeout_with_nothing_flushed_is_error(monkeypatch):
    _fake_child(monkeypatch, "import time; time.sleep(60)")
    rec, err = bench._run_section("pipeline", [], 3.0)
    assert rec is None
    assert "timed out" in err


def test_child_crash_keeps_partial_with_marker(monkeypatch):
    _fake_child(monkeypatch, r"""
print('SECTION_JSON {"train_steps_per_sec": 15.7}', flush=True)
raise SystemExit(1)
""")
    rec, err = bench._run_section("train", [], 30.0)
    assert err is None
    assert rec["train_steps_per_sec"] == 15.7
    assert "rc=1" in rec["partial_error"]


def test_crash_with_no_output_is_error(monkeypatch):
    _fake_child(monkeypatch, "raise SystemExit(2)")
    rec, err = bench._run_section("graph", [], 30.0)
    assert rec is None
    assert "rc=2" in err


@pytest.mark.parametrize("name", ["pipeline", "train", "graph", "all"])
def test_section_dispatch_names_exist(name):
    # the parent spawns `bench.py --section <name>`; a typo here would turn
    # every run of that section into an instant rc!=0 failure
    src = open(os.path.join(REPO, "bench.py")).read()
    assert f'name == "{name}"' in src


def test_failure_record_is_valid_json_line(monkeypatch):
    """End-to-end parent run with every child failing: the final line must
    still be one parseable JSON record with value 0 and the error."""
    env = dict(os.environ,
               RVC_BENCH_HARD_CAP_S="3", RVC_BENCH_ALL_CAP_S="3",
               RVC_BENCH_SKIP_TRAIN="1")
    # fake the real children too: --section children import jax (slow);
    # point PATH-level python at a hanging stub via a wrapper script
    stub = os.path.join(REPO, "tests", "_hang_stub.py")
    with open(stub, "w") as f:
        f.write("import time\ntime.sleep(30)\n")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", (
                "import sys, subprocess, runpy, os\n"
                "real=subprocess.run\n"
                "def fake(cmd, **kw):\n"
                f"    return real([sys.executable, {stub!r}], **kw)\n"
                "subprocess.run=fake\n"
                "sys.argv=['bench.py']\n"
                f"runpy.run_path(os.path.join({REPO!r}, 'bench.py'), run_name='__main__')\n"
            )],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=env, timeout=120,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        assert rec["metric"] == "vc_e2e_realtime_factor_48k"
        assert rec["value"] == 0.0
        assert "pipeline_error" in rec
    finally:
        os.unlink(stub)
