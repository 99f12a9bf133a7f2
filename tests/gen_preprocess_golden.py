"""Generate the EXECUTED-reference golden for the offline preprocessor.

Runs the reference's own old_process_sequence (/root/reference/
preprocess.py:255-350) — XML parse, cropbox/transform geometry, the
deform/zoom/bound legality gate, Gaussian gt generation, and the .txt/.bin
writers — on the deterministic synthetic annotation tree in
tests/synthetic_vid.py, and commits every produced output file byte-for-byte
as tests/fixtures/tf_goldens_preprocess.npz.

Py2 semantics note: the one true-division the pipeline's numbers depend on
is `sigma = bbox_grid/focus` (preprocess.py:237) with two INT operands,
which floor-divides under Python 2. FLAGS.focus is injected as _Py2Int so
executing under Python 3 keeps the reference's original semantics
(6/_Py2Int(4) == 1); every other division in the path is already explicit
float math (verified by reading preprocess.py:73-240).

Regenerate with: python tests/gen_preprocess_golden.py
(needs tensorflow + the reference checkout; the committed test does not).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.gen_tf_goldens import FIXTURE_DIR, _load_patched_module  # noqa: E402
from tests.synthetic_vid import write_synthetic_vid  # noqa: E402

# fictional absolute image root: the preprocessor only RECORDS image paths
# (never opens them), and a fixed string keeps the golden .txt bytes
# reproducible across machines/tmpdirs
FAKE_IMAGE_DIR = "/data/ILSVRC2015/Data"


class _Py2Int(int):
    """An int whose true division restores Python 2 `/` semantics (floor
    for int operands) — injected for FLAGS.focus only."""

    def __rtruediv__(self, other):
        if isinstance(other, int) and not isinstance(other, bool):
            return other // int(self)
        return other / int(self)


def run_reference_preprocess(anno_dir: str, output_dir: str):
    flags_ns = types.SimpleNamespace(
        cropbox_grid=8,
        bbox_grid=6,
        focus=_Py2Int(4),  # preprocess.py:522 default
        deform_threshold=0.1,
        zoom_threshold=0.1,
        annotation_dir=anno_dir,
        image_dir=FAKE_IMAGE_DIR,
        output_dir=output_dir,
        save_imgs=False,
    )
    ref = _load_patched_module(
        "preprocess.py",
        "ref_preprocess",
        extra_globals={"_INJECTED_FLAGS": flags_ns},
        extra_patches=[("FLAGS = flags.FLAGS", "FLAGS = _INJECTED_FLAGS")],
    )
    # the reference walks with os.walk + Pool(7) (preprocess.py:476-509);
    # walk the same leaf dirs here, single-process, deterministic order
    seq_dirs = sorted(
        dirpath
        for dirpath, _dirs, files in os.walk(anno_dir)
        if any(f.endswith(".xml") for f in files)
    )
    for d in seq_dirs:
        ref.old_process_sequence(d)


def collect_tree(root: str) -> dict:
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, root)] = fh.read()
    return out


def main():
    tmp = tempfile.mkdtemp(prefix="ref_preprocess_")
    try:
        anno_dir, _ = write_synthetic_vid(os.path.join(tmp, "in"))
        ref_out = os.path.join(tmp, "out_ref")
        os.makedirs(ref_out)
        run_reference_preprocess(anno_dir, ref_out)
        files = collect_tree(ref_out)
        assert files, "reference produced no output"

        payload = {"paths": np.array(sorted(files), dtype=np.str_)}
        for i, p in enumerate(sorted(files)):
            payload[f"data_{i}"] = np.frombuffer(files[p], dtype=np.uint8)
        dest = os.path.join(FIXTURE_DIR, "tf_goldens_preprocess.npz")
        np.savez_compressed(dest, **payload)
        print(f"wrote {dest}: {len(files)} files")
        for p in sorted(files):
            print(f"  {p} ({len(files[p])} bytes)")

        # self-check: our preprocessor on the same tree, byte-for-byte
        from ntm_tracker_tpu.config import DataConfig
        from ntm_tracker_tpu.data.preprocess import PreprocessJob, run_preprocess

        ours_out = os.path.join(tmp, "out_ours")
        os.makedirs(ours_out)
        n = run_preprocess(
            PreprocessJob(anno_dir, FAKE_IMAGE_DIR, ours_out, DataConfig()),
            num_workers=1,
        )
        ours = collect_tree(ours_out)
        print(f"ours wrote {n} frames, {len(ours)} files")
        ok = True
        if set(ours) != set(files):
            ok = False
            print("PATH MISMATCH:")
            print("  only ref :", sorted(set(files) - set(ours)))
            print("  only ours:", sorted(set(ours) - set(files)))
        for p in sorted(set(files) & set(ours)):
            if files[p] != ours[p]:
                ok = False
                print(f"BYTE MISMATCH {p}:")
                if p.endswith(".txt"):
                    print("  ref :", files[p].decode())
                    print("  ours:", ours[p].decode())
                elif len(files[p]) != len(ours[p]):
                    print(f"  length {len(ours[p])} != ref {len(files[p])}")
                else:
                    a = np.frombuffer(files[p], np.float64)
                    b = np.frombuffer(ours[p], np.float64)
                    print("  max abs diff:", np.abs(a - b).max())
        if not ok:
            # never exit 0 with a golden the parity suite is guaranteed to
            # fail on
            raise SystemExit("self-check FAILED: see mismatches above")
        print("self-check passed: byte-identical")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
