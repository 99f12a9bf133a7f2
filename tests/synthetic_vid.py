"""Deterministic synthetic ILSVRC-VID annotation tree, shared by the
executed-reference golden generator (gen_preprocess_golden.py) and the
parity test (test_tf_parity.py) so both sides preprocess IDENTICAL input.

The frame set is chosen to exercise every branch of the reference's
old_process_sequence (preprocess.py:255-350):
  * first appearance mid-sequence (track 1 enters at frame 2)
  * the deform gate (track 0, frame 3: aspect ratio blows past 1.1x)
  * the zoom gate (track 1, frame 4: scale leaves the ±10% band)
  * recovery after an illegal frame (track 0, frame 4 is legal again —
    the reference keeps gating against the ORIGINAL cropbox)
  * the within-bound gate (seq B's track 5 escapes its cropbox)
  * non-square sizes with the (dim-1) normalization (1280x720, 640x360)
"""

import os

# (seqname, (width, height), [(frame_idx, {trackid: [ymin,xmin,ymax,xmax]})])
SEQUENCES = [
    (
        "ILSVRC2015_train_00000000",
        (1280, 720),
        [
            (0, {0: [300, 500, 420, 660]}),
            (1, {0: [305, 510, 425, 670]}),
            (2, {0: [310, 505, 430, 665], 1: [100, 150, 220, 280]}),
            # track 0 deformed: width 160 -> 230 at the same height
            (3, {0: [310, 470, 430, 700], 1: [105, 155, 225, 285]}),
            # track 0 recovers; track 1 zooms: 130x120 -> 163x150
            (4, {0: [312, 508, 432, 668], 1: [90, 140, 240, 303]}),
            (5, {0: [308, 503, 428, 663], 1: [102, 152, 222, 282]}),
        ],
    ),
    (
        "ILSVRC2015_val_00001000",
        (640, 360),
        [
            (0, {5: [120, 200, 240, 360]}),
            (1, {5: [122, 205, 242, 365]}),
            # escapes the cropbox computed at frame 0 (within_bound fails)
            (2, {5: [120, 420, 240, 580]}),
            (3, {5: [118, 208, 238, 368]}),
        ],
    ),
]

_XML = """<annotation>
\t<folder>VID/train/{seqname}</folder>
\t<filename>{frame:06d}</filename>
\t<size>
\t\t<width>{w}</width>
\t\t<height>{h}</height>
\t</size>
{objects}</annotation>
"""

_OBJ = """\t<object>
\t\t<trackid>{tid}</trackid>
\t\t<name>n00000000</name>
\t\t<bndbox>
\t\t\t<xmax>{xmax}</xmax>
\t\t\t<xmin>{xmin}</xmin>
\t\t\t<ymax>{ymax}</ymax>
\t\t\t<ymin>{ymin}</ymin>
\t\t</bndbox>
\t\t<occluded>0</occluded>
\t\t<generated>0</generated>
\t</object>
"""


def write_synthetic_vid(root):
    """Write the annotation tree; returns (annotation_dir, image_dir).
    Image files are never opened by the offline preprocessor (only their
    paths are recorded), so none are written."""
    anno_dir = os.path.join(root, "Annotations")
    image_dir = os.path.join(root, "Data")
    for seqname, (w, h), frames in SEQUENCES:
        d = os.path.join(anno_dir, "VID", "train", seqname)
        os.makedirs(d, exist_ok=True)
        for idx, objs in frames:
            objects = "".join(
                _OBJ.format(tid=tid, ymin=b[0], xmin=b[1], ymax=b[2], xmax=b[3])
                for tid, b in sorted(objs.items())
            )
            with open(os.path.join(d, f"{idx:06d}.xml"), "w") as f:
                f.write(_XML.format(seqname=seqname, frame=idx, w=w, h=h,
                                    objects=objects))
    return anno_dir, image_dir
