"""Scratch-zone lifecycle (VERDICT r12 task #5): zone-driving queries
must not leave orphan temp directories behind across runs."""

import os
import subprocess
import sys

from stglib_spark import scratch


def test_scratch_dirs_live_under_one_session_root():
    a = scratch.scratch_dir("t1_")
    b = scratch.scratch_dir("t2_")
    root = scratch.session_root()
    assert os.path.dirname(a) == root
    assert os.path.dirname(b) == root
    assert root.endswith(f"pid{os.getpid()}")


def test_dead_session_roots_are_swept():
    # fabricate a root for a pid that cannot exist, then trigger a sweep
    os.makedirs(scratch._BASE, exist_ok=True)
    dead = os.path.join(scratch._BASE, "pid999999999")
    os.makedirs(dead, exist_ok=True)
    open(os.path.join(dead, "orphan.txt"), "w").write("x")
    scratch._sweep_dead_sessions()
    assert not os.path.exists(dead)
    # the live session root survives the sweep
    root = scratch.session_root()
    assert os.path.isdir(root)


def test_session_root_removed_at_interpreter_exit():
    # a clean child process must remove its own session root on exit
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from stglib_spark import scratch; "
        "print(scratch.scratch_dir('exitcheck_'))"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    child_dir = out.stdout.strip()
    assert not os.path.exists(child_dir)
    assert not os.path.exists(os.path.dirname(child_dir))


def test_queries_use_scratch_not_bare_mkdtemp():
    # the leak fix is repo-wide: no query may allocate scratch space
    # outside the session root (mkstemp inside executor UDFs cleans up
    # after itself in a finally block and is exempt)
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "stglib_spark",
            "queries.py",
        )
    ).read()
    assert "tempfile.mkdtemp" not in src
