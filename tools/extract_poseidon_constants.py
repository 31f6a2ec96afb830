"""Extract Poseidon round-constant data from the reference Rust source.

Parses the POSEIDON1_RC literal table in
/root/reference/crates/backend/koala-bear/src/poseidon1_koalabear_16.rs
(protocol *data*, required for bit-exact interop) and writes
leanmultisig_tpu/poseidon/constants.py.

Run: python tools/extract_poseidon_constants.py
"""

import re
from pathlib import Path

SRC = Path("/root/reference/crates/backend/koala-bear/src/poseidon1_koalabear_16.rs")
DST = Path(__file__).resolve().parent.parent / "leanmultisig_tpu/poseidon/constants.py"

text = SRC.read_text()

# grab the POSEIDON1_RC block
m = re.search(r"POSEIDON1_RC[^=]*=\s*KoalaBear::new_2d_array\(\[(.*?)\]\);",
              text, re.S)
assert m, "POSEIDON1_RC table not found"
rows = re.findall(r"\[(.*?)\]", m.group(1), re.S)
rc = []
for row in rows:
    vals = [int(v, 16) for v in re.findall(r"0x[0-9a-fA-F]+", row)]
    assert len(vals) == 16, len(vals)
    rc.append(vals)
assert len(rc) == 28, len(rc)

mds = re.search(r"MDS_CIRC_COL[^=]*=\s*KoalaBear::new_array\(\[(.*?)\]\)", text, re.S)
mds_col = [int(v) for v in re.findall(r"\d+", mds.group(1))]
assert len(mds_col) == 16

out = f'''"""Poseidon permutation constants (width 16, KoalaBear).

Round-constant data extracted from the reference
(crates/backend/koala-bear/src/poseidon1_koalabear_16.rs:11-35,691-820)
by tools/extract_poseidon_constants.py. These are protocol constants the
TPU build must reproduce bit-exactly; the permutation *implementation* is
original (see perm.py / kernels.py).
"""

WIDTH = 16
HALF_FULL_ROUNDS = 4
PARTIAL_ROUNDS = 20
SBOX_DEGREE = 3
N_ROUNDS = 2 * HALF_FULL_ROUNDS + PARTIAL_ROUNDS

# First column of the circulant MDS matrix: mds[i][j] = MDS_COL[(i - j) % 16].
MDS_COL = {mds_col}

# ROUND_CONSTANTS[r][i], canonical u32; rounds 0-3 initial full, 4-23 partial,
# 24-27 terminal full.
ROUND_CONSTANTS = [
'''
for row in rc:
    out += "    [" + ", ".join(str(v) for v in row) + "],\n"
out += "]\n"

DST.write_text(out)
print(f"wrote {DST} ({len(rc)} rounds)")
