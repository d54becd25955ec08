"""Class-average viewer / selector — replacement for the reference's
Qt GUI (gui/thunder_stackview/MainWnd.h:55-92): PNG contact sheets,
.thu class filtering, and an INTERACTIVE terminal selector (``view``)
with the reference GUI's operations — paging, contrast, occupancy /
resolution sorting, per-class select, save list / save particles —
rendered as character-ramp thumbnails in curses (runs over ssh; no Qt).

    python -m thunder_tpu.cli.stackview show -i Reference_Round_010.mrcs -o sheet.png
    python -m thunder_tpu.cli.stackview info -i Reference_Round_010.mrcs --thu Meta_Round_010.thu
    python -m thunder_tpu.cli.stackview select -i Meta_Round_010.thu -o sel.thu --classes 0 3 7
    python -m thunder_tpu.cli.stackview view -i Reference_Round_010.mrcs \
        --thu Meta_Round_010.thu --class-info Class_Info_Round_010.txt -o sel.thu
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


_RAMP = " .:-=+*#%@"


def _thumb_chars(img: np.ndarray, tw: int, th: int, contrast: float = 1.0):
    """Downsample one class average to a (th, tw) character thumbnail."""
    h, w = img.shape
    ys = (np.linspace(0, h - 1, th)).astype(int)
    xs = (np.linspace(0, w - 1, tw)).astype(int)
    t = img[np.ix_(ys, xs)]
    lo, hi = np.percentile(img, [2, 98])
    t = np.clip((t - lo) / max(hi - lo, 1e-12), 0, 1)
    t = np.clip(0.5 + (t - 0.5) * contrast, 0, 1)
    idx = (t * (len(_RAMP) - 1)).astype(int)
    return ["".join(_RAMP[i] for i in row) for row in idx]


def _curses_view(stack, occ, res_a, out_thu, thu_path):
    """Interactive class selector (MainWnd.h:55-92 operations)."""
    import curses

    n = stack.shape[0]
    order = np.arange(n)
    selected = np.zeros(n, bool)
    state = {"cursor": 0, "page": 0, "contrast": 1.0, "sort": "none",
             "msg": "space=select  s/S=sort occ/res  +/-=contrast  "
                    "w=write .thu  l=write list  q=quit"}

    def resort(key, desc):
        if key == "occ" and occ is not None:
            o = np.argsort(occ)
        elif key == "res" and res_a is not None:
            o = np.argsort(res_a)
        else:
            state["msg"] = f"no {key} data loaded"
            return order
        state["sort"] = key + ("-desc" if desc else "-asc")
        return o[::-1] if desc else o

    def run(scr):
        nonlocal order
        curses.curs_set(0)
        while True:
            scr.erase()
            hh, ww = scr.getmaxyx()
            tw, th = 22, 11
            cols = max(1, ww // (tw + 2))
            rows = max(1, (hh - 2) // (th + 2))
            per_page = cols * rows
            n_pages = (n + per_page - 1) // per_page
            state["page"] = min(state["page"], n_pages - 1)
            start = state["page"] * per_page
            for slot, pos in enumerate(range(start,
                                             min(n, start + per_page))):
                ci = int(order[pos])
                r, c = divmod(slot, cols)
                y0, x0 = r * (th + 2), c * (tw + 2)
                mark = "*" if selected[ci] else " "
                cur = pos - start == state["cursor"]
                head = f"{mark}{ci:3d}"
                if occ is not None:
                    head += f" {occ[ci]:.3f}"
                if res_a is not None and np.isfinite(res_a[ci]):
                    head += f" {res_a[ci]:.1f}A"
                try:
                    scr.addstr(y0, x0, head[:tw],
                               curses.A_REVERSE if cur else
                               (curses.A_BOLD if selected[ci] else 0))
                    for i, line in enumerate(_thumb_chars(
                            stack[ci], tw, th, state["contrast"])):
                        scr.addstr(y0 + 1 + i, x0, line)
                except curses.error:
                    pass
            foot = (f"page {state['page'] + 1}/{n_pages}  "
                    f"sel {int(selected.sum())}/{n}  "
                    f"sort {state['sort']}  | {state['msg']}")
            try:
                scr.addstr(hh - 1, 0, foot[:ww - 1])
            except curses.error:
                pass
            scr.refresh()
            k = scr.getch()
            pp = per_page
            if k == ord("q"):
                return
            elif k == ord(" "):
                ci = int(order[start + state["cursor"]])
                selected[ci] = not selected[ci]
            elif k == curses.KEY_RIGHT:
                state["cursor"] = min(state["cursor"] + 1,
                                      min(pp, n - start) - 1)
            elif k == curses.KEY_LEFT:
                state["cursor"] = max(state["cursor"] - 1, 0)
            elif k == curses.KEY_DOWN:
                state["cursor"] = min(state["cursor"] + cols,
                                      min(pp, n - start) - 1)
            elif k == curses.KEY_UP:
                state["cursor"] = max(state["cursor"] - cols, 0)
            elif k == curses.KEY_NPAGE:
                state["page"] = min(state["page"] + 1, n_pages - 1)
                state["cursor"] = 0
            elif k == curses.KEY_PPAGE:
                state["page"] = max(state["page"] - 1, 0)
                state["cursor"] = 0
            elif k in (ord("+"), ord("=")):
                state["contrast"] = min(state["contrast"] * 1.3, 8.0)
            elif k == ord("-"):
                state["contrast"] = max(state["contrast"] / 1.3, 0.2)
            elif k == ord("s"):
                order = resort("occ", True)
            elif k == ord("S"):
                order = resort("res", False)
            elif k == ord("l"):
                lst = out_thu + ".classes.txt" if out_thu else "selected_classes.txt"
                with open(lst, "w") as f:
                    f.write("\n".join(str(i) for i in
                                      np.nonzero(selected)[0]) + "\n")
                state["msg"] = f"wrote {lst}"
            elif k == ord("w"):
                if not (out_thu and thu_path):
                    state["msg"] = "need -o and --thu to write particles"
                    continue
                from thunder_tpu.io.thu import read_thu, write_thu

                t = read_thu(thu_path)
                keep = np.isin(t.class_id, np.nonzero(selected)[0])
                write_thu(out_thu, t.select(np.nonzero(keep)[0]))
                state["msg"] = (f"wrote {out_thu} "
                                f"({int(keep.sum())}/{len(t)} particles)")

    curses.wrapper(run)
    return selected


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
    s = sub.add_parser("view")
    s.add_argument("-i", required=True, help="class-average stack .mrcs")
    s.add_argument("--thu", help="meta .thu (for 'w' save-particles)")
    s.add_argument("--class-info",
                   help="Class_Info_Round_xxx.txt (occupancy/resolution)")
    s.add_argument("-o", help="output filtered .thu for 'w'")
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
    elif a.cmd == "view":
        import sys

        if not sys.stdout.isatty():
            sys.exit("view needs a terminal; use 'show'/'select' headless")
        stack, _ = read_mrc(a.i, shift=False)
        if stack.ndim == 2:
            stack = stack[None]
        occ = res_a = None
        if a.class_info:
            rows = np.loadtxt(a.class_info, ndmin=2)
            occ = np.zeros(stack.shape[0])
            res_a = np.full(stack.shape[0], np.inf)
            for ci, o, r in rows[:, :3]:
                if 0 <= int(ci) < stack.shape[0]:
                    occ[int(ci)] = o
                    res_a[int(ci)] = r
        elif a.thu:
            t = read_thu(a.thu)
            occ = np.bincount(t.class_id.astype(int),
                              minlength=stack.shape[0]).astype(float)
            occ /= max(occ.sum(), 1)
        sel = _curses_view(stack, occ, res_a, a.o, a.thu)
        print("selected classes:",
              " ".join(str(i) for i in np.nonzero(sel)[0]))
    else:
        t = read_thu(a.i)
        keep = np.isin(t.class_id, np.asarray(a.classes))
        out = t.select(np.nonzero(keep)[0])
        write_thu(a.o, out)
        print(f"kept {len(out)}/{len(t)} particles from classes {a.classes}")


if __name__ == "__main__":
    main()
