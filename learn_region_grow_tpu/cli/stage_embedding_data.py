"""CLI: stage embedding-conditioned (19-d) growth training data
(reference ``experimental/stage_embedding_data.py``; requires a trained
MCPNet checkpoint)."""

import argparse
import os

from ..data.embedding_staging import (embedding_staged_path,
                                      stage_embedding_rooms)
from ..data.simulator import area_input_path
from ..utils.io import load_h5_rooms, save_staged_h5
from .test_region_grow_emb import load_mcp


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", default="1,2,3,4,5,6")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--resolution", type=float, default=0.1)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--mcp-model", required=True)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    mcp_params, mcp_cfg = load_mcp(args.mcp_model)
    for area in args.area.split(","):
        rooms, obj_ids, cls_ids = load_h5_rooms(
            area_input_path(args.data_dir, area, args.seed))
        samples = stage_embedding_rooms(rooms, obj_ids, cls_ids, mcp_params,
                                        mcp_cfg, resolution=args.resolution,
                                        seed=args.seed, verbose=args.verbose)
        out = embedding_staged_path(args.data_dir, area, args.seed)
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        save_staged_h5(out, samples)
        print(f"Staged {samples.num_samples()} samples -> {out}")


if __name__ == "__main__":
    main()
