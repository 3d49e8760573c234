"""tools/supervised_sweep.sh: stall detection, restart, clean completion."""

import os
import stat
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "supervised_sweep.sh")


def test_supervisor_restarts_stalled_child_and_completes(tmp_path):
    """First incarnation writes one line then hangs; the supervisor must
    kill it on stall and restart; the second incarnation (seeing the
    marker) exits 0 and the supervisor completes."""
    marker = tmp_path / "ran_once"
    log = tmp_path / "log"
    child = tmp_path / "child.sh"
    child.write_text(
        "#!/usr/bin/env bash\n"
        f"if [ -f {marker} ]; then echo second-run-done; exit 0; fi\n"
        f"touch {marker}\n"
        "echo first-run-hangs\n"
        "sleep 600\n")
    child.chmod(child.stat().st_mode | stat.S_IEXEC)

    env = dict(os.environ, LOG=str(log), STALL_S="2", POLL_S="1",
               KILL_GRACE_S="1", RESTART_DELAY_S="1", MAX_RESTARTS="3")
    proc = subprocess.run(["bash", SCRIPT, str(child)], env=env, timeout=60,
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    text = log.read_text()
    assert "first-run-hangs" in text
    assert "no progress" in text          # stall detected
    assert "second-run-done" in text      # restarted child completed
    assert "supervisor: completed" in text


def test_supervisor_gives_up_after_max_restarts(tmp_path):
    log = tmp_path / "log"
    child = tmp_path / "child.sh"
    child.write_text("#!/usr/bin/env bash\nexit 3\n")
    child.chmod(child.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ, LOG=str(log), STALL_S="5", POLL_S="1",
               RESTART_DELAY_S="0", MAX_RESTARTS="2")
    proc = subprocess.run(["bash", SCRIPT, str(child)], env=env, timeout=60)
    assert proc.returncode == 3
    assert "giving up after 2 restarts" in log.read_text()
