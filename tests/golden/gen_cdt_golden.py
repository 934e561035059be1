"""Generate cdt_btree.json by RUNNING the reference's CDT builder
(``/root/reference/tiberate/rng/csprng/discrete_gaussian_sampler.py:8-110``,
mpmath at 256-bit precision) — the golden file's provenance is the
reference's own algorithm, not this repo's output (VERDICT r2 #9).

Run (requires the reference checkout + mpmath):
    python tests/golden/gen_cdt_golden.py
"""

import json
import os
import sys

REF = os.environ.get("TIBERATE_REFERENCE", "/root/reference")
sys.path.insert(0, os.path.join(REF, "tiberate", "rng", "csprng"))

from discrete_gaussian_sampler import build_CDT_binary_search_tree  # noqa: E402

btree, _ptr, size, depth = build_CDT_binary_search_tree(
    security_bits=128, sigma=3.2
)
out = {
    "provenance": (
        "reference tiberate/rng/csprng/discrete_gaussian_sampler.py "
        "build_CDT_binary_search_tree(security_bits=128, sigma=3.2), "
        "mpmath mp.prec=256"
    ),
    "tree_depth": int(depth),
    "btree_size": int(size),
    # [size, 2] (low 64, high 64) as decimal strings (json has no u64)
    "btree": [[str(int(lo)), str(int(hi))] for lo, hi in btree],
}
path = os.path.join(os.path.dirname(__file__), "cdt_btree.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", path, "size", size, "depth", depth)
