"""Class-average viewer / selector — headless replacement for the
reference's Qt GUI (gui/thunder_stackview): renders a class-average
stack to PNG contact sheets and filters a .thu by selected classes.

    python -m thunder_tpu.cli.stackview show -i Reference_Round_010.mrcs -o sheet.png
    python -m thunder_tpu.cli.stackview info -i Reference_Round_010.mrcs --thu Meta_Round_010.thu
    python -m thunder_tpu.cli.stackview select -i Meta_Round_010.thu -o sel.thu --classes 0 3 7
"""

from __future__ import annotations

import argparse

import numpy as np


def _contact_sheet(stack: np.ndarray, cols: int = 8, pad: int = 2) -> np.ndarray:
    n, h, w = stack.shape
    rows = (n + cols - 1) // cols
    sheet = np.zeros((rows * (h + pad), cols * (w + pad)), np.float32)
    for i in range(n):
        img = stack[i]
        lo, hi = np.percentile(img, [1, 99])
        img = np.clip((img - lo) / max(hi - lo, 1e-12), 0, 1)
        r, c = divmod(i, cols)
        sheet[r * (h + pad):r * (h + pad) + h,
              c * (w + pad):c * (w + pad) + w] = img
    return sheet


def _write_png(path: str, img: np.ndarray) -> None:
    """Minimal grayscale PNG writer (no pillow dependency)."""
    import struct
    import zlib

    data = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    h, w = data.shape
    raw = b"".join(b"\x00" + data[r].tobytes() for r in range(h))

    def chunk(tag, payload):
        c = struct.pack(">I", len(payload)) + tag + payload
        return c + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)

    header = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def main(argv=None):
    p = argparse.ArgumentParser(prog="thunder_stackview")
    sub = p.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("show")
    s.add_argument("-i", required=True, help="class-average stack .mrcs")
    s.add_argument("-o", required=True, help="output PNG contact sheet")
    s.add_argument("--cols", type=int, default=8)
    s = sub.add_parser("info")
    s.add_argument("-i", required=True)
    s.add_argument("--thu", help="meta .thu for per-class occupancy")
    s = sub.add_parser("select")
    s.add_argument("-i", required=True, help="meta .thu")
    s.add_argument("-o", required=True, help="filtered .thu")
    s.add_argument("--classes", type=int, nargs="+", required=True)
    a = p.parse_args(argv)

    from thunder_tpu.io.mrc import read_mrc
    from thunder_tpu.io.thu import read_thu, write_thu

    if a.cmd == "show":
        stack, _ = read_mrc(a.i, shift=False)
        if stack.ndim == 2:
            stack = stack[None]
        _write_png(a.o, _contact_sheet(stack, a.cols))
        print(f"wrote {a.o} ({stack.shape[0]} classes)")
    elif a.cmd == "info":
        stack, _ = read_mrc(a.i, shift=False)
        if stack.ndim == 2:
            stack = stack[None]
        occ = None
        if a.thu:
            t = read_thu(a.thu)
            occ = np.bincount(t.class_id.astype(int), minlength=stack.shape[0])
            occ = occ / max(occ.sum(), 1)
        for i in range(stack.shape[0]):
            line = f"class {i:3d}: std={stack[i].std():.4f}"
            if occ is not None:
                line += f" occupancy={occ[i]:.4f}"
            print(line)
    else:
        t = read_thu(a.i)
        keep = np.isin(t.class_id, np.asarray(a.classes))
        out = t.select(np.nonzero(keep)[0])
        write_thu(a.o, out)
        print(f"kept {len(out)}/{len(t)} particles from classes {a.classes}")


if __name__ == "__main__":
    main()
