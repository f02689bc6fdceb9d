"""CLI: MCPNet instance-segmentation evaluation
(reference ``test_mcpnet.py``: embeddings -> voxel adjacency gated by
embedding dot > 0.9 -> connected components -> metrics)."""

import argparse
import os

import numpy as np

from ..eval.metrics import aggregate_line, room_metrics
from ..train.checkpoint import load_checkpoint
from ..train.mcpnet_trainer import MCPTrainConfig, segment_rooms_mcp
from ..utils.io import load_h5_rooms, save_ply


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--area", default="1,2,3,4,5,6,scannet")
    ap.add_argument("--save", action="store_true")
    ap.add_argument("--dp-threshold", type=float, default=0.9)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--models-dir", default="models")
    ap.add_argument("--model", default=None)
    args = ap.parse_args(argv)

    cfg = MCPTrainConfig(data_dir=args.data_dir, models_dir=args.models_dir)
    agg = []
    save_id = 0
    for area in args.area.split(","):
        model_path = args.model or os.path.join(
            args.models_dir,
            "mcpnet_model%s.npz" % ("5" if area == "scannet" else area))
        params, _, _ = load_checkpoint(model_path)
        print("Restored from %s" % model_path)
        rooms_path = (os.path.join(args.data_dir, f"{area}.h5")
                      if area == "scannet" or area.startswith("synthetic")
                      else os.path.join(args.data_dir, f"s3dis_area{area}.h5"))
        rooms, obj_ids, _cls = load_h5_rooms(rooms_path)
        results = segment_rooms_mcp(params, cfg, rooms, obj_ids,
                                    dp_threshold=args.dp_threshold)
        for rid, (labels, obj, uneq, emb) in enumerate(results):
            m, cluster_label2 = room_metrics(obj, labels)
            agg.append(m)
            print("Area %s room %d NMI: %.2f AMI: %.2f ARS: %.2f PRC: %.2f "
                  "RCL: %.2f IOU: %.2f" % (area, rid, m.nmi, m.ami, m.ars,
                                           m.prc, m.rcl, m.iou))
            if args.save:
                state = np.random.RandomState(0)
                colors = state.randint(0, 255, (cluster_label2.max() + 1, 3))
                out = np.asarray(rooms[rid]).copy()
                out[:, 3:6] = colors[cluster_label2][uneq]
                os.makedirs(os.path.join(args.data_dir, "results"),
                            exist_ok=True)
                save_ply(os.path.join(args.data_dir, "results",
                                      f"{save_id}.ply"), out)
                save_id += 1
    print(aggregate_line(agg))
    return agg


if __name__ == "__main__":
    main()
