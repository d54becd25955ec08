"""Diagnose the 2D-classification parity gap: is it ALIGNMENT or
RECONSTRUCTION?

Rebuilds per-class averages from the final .thu poses of BOTH
frameworks with one independent numpy pipeline (inverse-rotate +
inverse-shift each raw particle, average per class, split-half FSC).
If the reference's poses give sharper averages than ours under the
SAME averaging code, our expectation step is the gap; if both give the
same shells, our maximization/FSC machinery is.

    python scripts/diag_2d_poses.py /tmp/parity2d_r4
"""

import os
import sys

import numpy as np
from scipy.ndimage import rotate, shift

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from thunder_tpu.io.mrc import read_mrc            # noqa: E402
from thunder_tpu.io.thu import read_thu            # noqa: E402


def avg_from_thu(imgs, thu, k):
    """Class averages from .thu poses (internal image layout), split
    into even/odd halves per class; returns (k, 2, size, size)."""
    n, size = imgs.shape[0], imgs.shape[1]
    quat = thu.quat
    # 2D in-plane angle from the (w, z) quaternion pair
    ang = 2.0 * np.arctan2(quat[:, 3], quat[:, 0])
    cls = thu.class_id.astype(int)
    acc = np.zeros((k, 2, size, size), np.float64)
    cnt = np.zeros((k, 2), np.int64)
    for i in range(n):
        im = shift(imgs[i], -thu.trans[i], order=1)
        im = rotate(im, np.degrees(ang[i]), reshape=False, order=1)
        acc[cls[i], i % 2] += im
        cnt[cls[i], i % 2] += 1
    return acc / np.maximum(cnt, 1)[:, :, None, None], cnt


def ring_fsc(a, b):
    fa = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(a)))
    fb = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(b)))
    size = a.shape[0]
    kv = np.arange(size) - size // 2
    ky, kx = np.meshgrid(kv, kv, indexing="ij")
    r = np.round(np.hypot(kx, ky)).astype(int)
    out = []
    for s in range(1, size // 2):
        m = r == s
        num = np.real(np.sum(fa[m] * np.conj(fb[m])))
        den = np.sqrt(np.sum(np.abs(fa[m]) ** 2)
                      * np.sum(np.abs(fb[m]) ** 2))
        out.append(num / max(den, 1e-12))
    return np.asarray(out)


def crossing(fsc, thres=0.143):
    below = np.nonzero(fsc < thres)[0]
    return int(below[0]) + 1 if below.size else len(fsc) + 1


def main():
    wd = sys.argv[1]
    imgs, _ = read_mrc(os.path.join(wd, "particles.mrcs"))
    imgs = np.asarray(imgs)
    rounds = sorted(
        f for f in os.listdir(os.path.join(wd, "output_ref"))
        if f.startswith("Meta_Round_"))
    last = rounds[-1]
    for side in ("ref", "tpu"):
        thu = read_thu(os.path.join(wd, f"output_{side}", last))
        k = int(thu.class_id.max()) + 1
        for sign_a, sign_t in ((1, 1), (-1, 1), (1, -1), (-1, -1)):
            t = thu
            t.quat = thu.quat.copy()
            t.quat[:, 3] *= sign_a
            t.trans = thu.trans * sign_t
            avg, cnt = avg_from_thu(imgs, t, k)
            shells = [crossing(ring_fsc(avg[c, 0], avg[c, 1]))
                      for c in range(k)]
            peak = [float(np.abs(avg[c].mean(0)).max()) for c in range(k)]
            print(f"{side} {last} sign(ang,trans)=({sign_a},{sign_t}) "
                  f"shells={shells} peak={np.round(peak, 3).tolist()} "
                  f"cnt={cnt.sum(1).tolist()}")


if __name__ == "__main__":
    main()
