"""thunder_postprocess rebuild (appsrc/thunder_postprocess.cpp):

    python -m thunder_tpu.cli.postprocess -a half_A.mrc -b half_B.mrc \
        -m mask.mrc --pixelsize 1.32
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(prog="thunder_postprocess")
    p.add_argument("-a", required=True, help="half map A")
    p.add_argument("-b", required=True, help="half map B")
    p.add_argument("-m", help="mask MRC (auto-generated if absent)")
    p.add_argument("--pixelsize", type=float, required=True)
    p.add_argument("--out-prefix", default="")
    a = p.parse_args(argv)

    from thunder_tpu.io.mrc import read_mrc, write_mrc
    from thunder_tpu.physics.mask import auto_mask
    from thunder_tpu.postprocess import postprocess

    map_a, _ = read_mrc(a.a)
    map_b, _ = read_mrc(a.b)
    if a.m:
        mask, _ = read_mrc(a.m)
    else:
        size = map_a.shape[-1]
        mask = auto_mask((map_a + map_b) / 2, size // 2 - 2, ext=3.0, ew=6.0)

    res = postprocess(map_a, map_b, mask, a.pixelsize)

    pre = a.out_prefix
    with open(pre + "Postprocess_FSC.txt", "w") as f:
        size = map_a.shape[-1]
        for i in range(1, len(res.fsc_true)):
            res_a = size * a.pixelsize / i
            f.write(f"{i:05d} {res_a:10.6f} {res.fsc_unmask[i]:10.6f} "
                    f"{res.fsc_mask[i]:10.6f} {res.fsc_true[i]:10.6f}\n")
    write_mrc(pre + "Reference_Average.mrc", res.map_avg, a.pixelsize)
    write_mrc(pre + "Reference_Sharp.mrc", res.map_sharp, a.pixelsize)
    print(f"resolution: {res.res_angstrom:.2f} A (shell {res.res_shell}), "
          f"B factor: {res.b_factor:.1f}")


if __name__ == "__main__":
    main()
