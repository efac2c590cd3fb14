#!/bin/sh
# Generate the Fortran reference goldens for tests/test_fortran_parity.py.
#
# Run this on a machine that HAS gfortran (this container does not —
# BASELINE.md environment note).  Steps it performs:
#   1. fetch the pinned kdtree2 (the reference's empty submodule),
#   2. convert the reference VTU meshes to .binda with THIS repo's
#      converter (byte-compatible; avoids the meshio dependency),
#   3. write the shared deterministic query points,
#   4. build the reference + golden_emitter (Makefile here),
#   5. emit goldens into tools/fortran_parity/goldens/.
# Afterwards `python -m pytest tests/test_fortran_parity.py` in the
# repo root runs the real <=1e-12 comparison instead of skipping.
set -eu

HERE=$(cd "$(dirname "$0")" && pwd)
REPO=$(cd "$HERE/../.." && pwd)
REF_DIR=${REF_DIR:-/root/reference}
KDTREE2_PIN=${KDTREE2_PIN:-master}
WORK="$HERE/work"
GOLD="$HERE/goldens"
mkdir -p "$WORK" "$GOLD"

# 1. kdtree2 (reference .gitmodules pins url, no sha — pin via env)
if [ ! -f "$REF_DIR/kdtree2/src/kdtree2_module.f90" ]; then
    KD="$WORK/kdtree2"
    if [ ! -d "$KD" ]; then
        git clone https://github.com/jannisteunissen/kdtree2.git "$KD"
        git -C "$KD" checkout "$KDTREE2_PIN"
    fi
    KDTREE2_DIR="$KD"
else
    KDTREE2_DIR="$REF_DIR/kdtree2"
fi

# 2.+3. binda meshes + deterministic queries (JAX/CPU, this repo)
cd "$REPO"
JAX_PLATFORMS=cpu python - "$REF_DIR" "$WORK" "$HERE" <<'EOF'
import sys, os
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
ref_dir, work, here = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, os.getcwd())   # repo root
sys.path.insert(0, here)          # parity_common
from interpolate_unstructured_tpu.io.convert import convert_to_binda
import interpolate_unstructured_tpu as iu
import parity_common as pc
for mesh in pc.MESHES:
    vtu = os.path.join(ref_dir, "test_data", f"{mesh}.vtu")
    binda = convert_to_binda(vtu, os.path.join(work, mesh), force=True)
    g = iu.read_grid(binda)
    q = pc.query_points(mesh, g.rmin, g.rmax)
    q.astype("<f8").tofile(os.path.join(work, f"{mesh}_queries.raw"))
    print(mesh, "converted;", q.shape, "queries")
EOF

# 4. build the reference + emitter
make -C "$HERE" REF_DIR="$REF_DIR" KDTREE2_DIR="$KDTREE2_DIR"

# 5. emit goldens
cd "$WORK"
for mesh in triangle quad tetra; do
    "$HERE/golden_emitter" interp "$mesh.binda" "${mesh}_queries.raw" \
        1000 "$GOLD/${mesh}_interp.raw"
done
"$HERE/golden_emitter" trace triangle.binda "$GOLD/trace.raw"
echo "goldens written to $GOLD — run: python -m pytest tests/test_fortran_parity.py"
