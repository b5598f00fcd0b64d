"""CPM (cooperative perception message) wire-size analysis.

Parity: utils/draco_compression.py:1-60 — the reference dumps keypoint
coords+features to .ply and shells out to Google's draco binary to
measure compressed CPM sizes. This environment has no draco, so the
analyzer ships a built-in draco-style codec (uniform coordinate
quantization to n bits over the bounding box + zlib entropy stage) and
uses a real ``draco_encoder`` binary only if one is on PATH.

Also accounts the codebook wire (the QuantV2X transport): codes bits =
H*W * levels * seg_num * ceil(log2(dict_size)) — matching
heter_pyramid_collab_codebook_mc.py:27-51.

CLI:
  python -m quantv2x_tpu.tools.cpm_analysis --ply-dir <dir>
  (or import analyze_* functions)
"""

import argparse
import glob
import json
import os
import re
import shutil
import struct
import subprocess
import zlib
from typing import Optional, Sequence

import numpy as np


def save_ply(path: str, coords: np.ndarray, features: np.ndarray):
    """ASCII PLY with x/y/z + featN properties (draco_compression.save_ply
    parity — same header layout for draco interop)."""
    n, fdim = len(coords), features.shape[1]
    header = (
        "ply\nformat ascii 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        + "".join(f"property float feat{i}\n" for i in range(fdim))
        + "end_header"
    )
    data = np.concatenate([coords, features], axis=1)
    np.savetxt(path, data, delimiter=" ", header=header, comments="")


def load_ply(path: str):
    with open(path) as f:
        txt = f.read()
    head, _, body = txt.partition("end_header")
    n = int(re.findall(r"element vertex (\d+)", head)[0])
    data = np.loadtxt(body.strip().splitlines()[:n] or [""])
    if data.ndim == 1:
        data = data.reshape(1, -1) if data.size else data.reshape(0, 0)
    return data[:, :3], data[:, 3:]


def compress_point_cloud(coords: np.ndarray, features: Optional[np.ndarray],
                         coord_bits: int = 11, feat_bits: int = 8) -> bytes:
    """Draco-style codec: uniform quantization over the AABB (draco's
    -qp default is 11 bits) + zlib. Returns the encoded blob."""
    if len(coords) == 0:
        return struct.pack("<I", 0)
    lo = coords.min(axis=0)
    hi = coords.max(axis=0)
    span = np.maximum(hi - lo, 1e-9)
    q = np.round((coords - lo) / span * (2 ** coord_bits - 1)).astype(
        np.uint16 if coord_bits <= 16 else np.uint32)
    # sort by Morton-ish lexicographic order: improves zlib locality
    order = np.lexsort((q[:, 2], q[:, 1], q[:, 0]))
    q = q[order]
    payload = [struct.pack("<I6f", len(coords), *lo, *span),
               np.ascontiguousarray(q).tobytes()]
    if features is not None and features.size:
        f = features[order]
        flo, fhi = f.min(axis=0), f.max(axis=0)
        fspan = np.maximum(fhi - flo, 1e-9)
        fq = np.round((f - flo) / fspan * (2 ** feat_bits - 1)).astype(
            np.uint8 if feat_bits <= 8 else np.uint16)
        payload.append(flo.astype(np.float32).tobytes())
        payload.append(fspan.astype(np.float32).tobytes())
        payload.append(np.ascontiguousarray(fq).tobytes())
    return zlib.compress(b"".join(payload), level=9)


def decompress_coords(blob: bytes, coord_bits: int = 11) -> np.ndarray:
    raw = zlib.decompress(blob)
    n, = struct.unpack("<I", raw[:4])
    lo = np.frombuffer(raw[4:16], np.float32)
    span = np.frombuffer(raw[16:28], np.float32)
    # dtype must mirror compress_point_cloud's coord_bits switch
    dt = np.uint16 if coord_bits <= 16 else np.uint32
    nbytes = n * 3 * np.dtype(dt).itemsize
    q = np.frombuffer(raw[28:28 + nbytes], dt).reshape(n, 3)
    return lo + q.astype(np.float64) / (2 ** coord_bits - 1) * span


def _external_draco() -> Optional[str]:
    return shutil.which("draco_encoder")


def cpm_size_one(ply_file: str, coord_bits: int = 11,
                 feat_bits: int = 8) -> int:
    """Compressed CPM size in bytes for one .ply (reference
    draco_compression_one:40-51; falls back to the built-in codec)."""
    draco = _external_draco()
    if draco:
        out_file = ply_file.replace(".ply", ".drc")
        out = subprocess.getoutput(
            f"{draco} -point_cloud -i {ply_file} -o {out_file}")
        sizes = re.findall(r"(\d+) bytes", out)
        if sizes:
            return int(sizes[0])
    coords, feats = load_ply(ply_file)
    return len(compress_point_cloud(coords, feats, coord_bits, feat_bits))


def analyze_ply_dir(ply_dir: str):
    """CPM sizes + avg keypoint payload across a dump dir
    (draco_compression:34-37, cal_avg_num_kpts:54-60)."""
    files = sorted(glob.glob(os.path.join(ply_dir, "**/*.ply"),
                             recursive=True))
    sizes = [cpm_size_one(f) for f in files]
    kpts, raw_kb = [], []
    for f in files:
        coords, feats = load_ply(f)
        kpts.append(len(coords))
        raw_kb.append(coords.nbytes / 1024 + feats.nbytes / 1024)
    return {
        "num_frames": len(files),
        "avg_cpm_bytes": float(np.mean(sizes)) if sizes else 0.0,
        "avg_keypoints": float(np.mean(kpts)) if kpts else 0.0,
        "avg_raw_kb": float(np.mean(raw_kb)) if raw_kb else 0.0,
        "avg_compression_ratio": (
            float(np.mean(raw_kb) * 1024 / max(np.mean(sizes), 1))
            if sizes else 0.0),
        "encoder": "draco" if _external_draco() else "builtin-qz",
    }


def codebook_wire_bytes(h: int, w: int, levels: int = 3, seg_num: int = 2,
                        dict_size: int = 256) -> dict:
    """Codebook transport accounting (the QuantV2X wire):
    bits/px = levels * seg_num * log2(dict_size)."""
    bits_px = levels * seg_num * int(np.ceil(np.log2(dict_size)))
    total = h * w * bits_px / 8
    fp32 = h * w * 64 * 4  # C=64 fp32 feature map
    return {"bits_per_pixel": bits_px, "bytes_per_frame": total,
            "fp32_bytes_per_frame": fp32,
            "compression_ratio": fp32 / total}


def main(argv: Optional[Sequence[str]] = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply-dir", required=True)
    args = ap.parse_args(argv)
    print(json.dumps(analyze_ply_dir(args.ply_dir), indent=2))


if __name__ == "__main__":
    main()
