"""Tree-identity stamp for generated armor artifacts (SCALE/SKEW/EM100/
bench refs): records WHICH code the artifact measured, so "still valid
because the code is identical" claims are mechanically checkable instead
of prose assertions. `+dirty` marks an uncommitted working tree — such an
artifact pins nothing and must be regenerated after the commit.

Sibling generated artifacts (SCALE_*/SKEW_*/EM100_*/BENCH_* JSON and the
selftest file) are excluded from the dirtiness probe: they are
measurement OUTPUTS, not measured code, and a round-closing sweep
necessarily rewrites several of them back-to-back before the single
artifact commit — without the exclusion, whichever tracked artifact was
regenerated first poisons every later leg's stamp in the same sweep."""
import re
import subprocess

_ARTIFACT = re.compile(
    r"^(SCALE|SKEW|EM100|BENCH|CORRECTNESS)_[a-z0-9_]+\.json$"
    r"|^SCALE_selftest\.json$|^LEAKCHECK\.json$",
    re.IGNORECASE)


def commit_stamp():
    try:
        h = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL).decode().strip()
        status = subprocess.check_output(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            stderr=subprocess.DEVNULL).decode().splitlines()
        dirty = [l for l in status
                 if not _ARTIFACT.match(l[3:].split(" -> ")[-1])]
        return h + ("+dirty" if dirty else "")
    except Exception:
        return "unknown"
