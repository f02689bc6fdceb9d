"""CLI: generate the synthetic room datasets
(reference ``tools/generate_synthetic_rooms.py:101-128``)."""

import argparse
import os

from ..data.synthetic import write_synthetic_dataset


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--num-train", type=int, default=20)
    ap.add_argument("--num-test", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args(argv)
    write_synthetic_dataset(
        os.path.join(args.data_dir, "synthetic_train.h5"),
        os.path.join(args.data_dir, "synthetic_test.h5"),
        num_train=args.num_train, num_test=args.num_test,
        seed=args.seed, scale=args.scale)
    print("wrote synthetic_train.h5 / synthetic_test.h5 to", args.data_dir)


if __name__ == "__main__":
    main()
