"""Tree-identity stamp for generated armor artifacts (SCALE/SKEW/EM100/
bench refs): records WHICH code the artifact measured, so "still valid
because the code is identical" claims are mechanically checkable instead
of prose assertions. `+dirty` marks an uncommitted working tree — such an
artifact pins nothing and must be regenerated after the commit."""
import subprocess


def commit_stamp():
    try:
        h = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL).decode().strip()
        dirty = subprocess.check_output(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            stderr=subprocess.DEVNULL).decode().strip()
        return h + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"
