"""CLI: print dataset shapes/stats of an H5 file
(reference ``examine_h5.py:1-10``)."""

import sys

import h5py
import numpy as np


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    for path in argv:
        with h5py.File(path, "r") as f:
            for k in f.keys():
                d = f[k]
                arr = d[:]
                print("%s %s %s min %s max %s" % (
                    k, d.shape, d.dtype,
                    np.min(arr, axis=0) if arr.size else "-",
                    np.max(arr, axis=0) if arr.size else "-"))


if __name__ == "__main__":
    main()
