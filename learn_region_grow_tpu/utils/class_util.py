"""Class tables for S3DIS / ScanNet(NYU40) / Semantic KITTI.

These are public dataset label vocabularies (reference: ``class_util.py:4-86``);
they are data, not code. Colors for semantic rendering follow the same
deterministic scheme so PLY outputs stay comparable.
"""

import numpy as np

CLASSES_S3DIS = [
    "clutter", "board", "bookcase", "beam", "chair", "column", "door",
    "sofa", "table", "window", "ceiling", "floor", "wall",
]
# Default alias used by drivers that do not care about the dataset.
CLASSES = CLASSES_S3DIS

CLASSES_NYU40 = [
    "none", "wall", "floor", "cabinet", "bed", "chair", "sofa", "table",
    "door", "window", "bookshelf", "picture", "counter", "blinds", "desk",
    "shelves", "curtain", "dresser", "pillow", "mirror", "floor mat",
    "clothes", "ceiling", "books", "refrigerator", "television", "paper",
    "towel", "shower curtain", "box", "whiteboard", "person", "nightstand",
    "toilet", "sink", "lamp", "bathtub", "bag", "otherstructure",
    "otherfurniture", "otherprop",
]

# Semantic KITTI: sparse id -> name table; ids >= 250 are moving classes.
_KITTI_NAMED = {
    0: "unlabeled", 1: "outlier", 10: "car", 11: "bicycle", 13: "bus",
    15: "motorcycle", 16: "on-rails", 18: "truck", 20: "other-vehicle",
    30: "person", 31: "bicyclist", 32: "motorcyclist", 40: "road",
    44: "parking", 48: "sidewalk", 49: "other-ground", 50: "building",
    51: "fence", 52: "other-structure", 60: "lane-marking", 70: "vegetation",
    71: "trunk", 72: "terrain", 80: "pole", 81: "traffic-sign",
    99: "other-object", 252: "moving-car", 253: "moving-bicyclist",
    254: "moving-person", 255: "moving-motorcyclist", 256: "moving-on-rails",
    257: "moving-bus", 258: "moving-truck", 259: "moving-other-vehicle",
}
CLASSES_KITTI = ["" for _ in range(260)]
for _i, _name in _KITTI_NAMED.items():
    CLASSES_KITTI[_i] = _name
KITTI_MOVING_MIN_ID = 250

CLASS_TO_ID = {name: i for i, name in enumerate(CLASSES_S3DIS)}

# Minimum fraction of an object's points required inside a grid cell for the
# object to count as present (used by PointNet block staging).
POINT_RATIO_THRESHOLD = {
    "clutter": 0, "board": 0.1, "bookcase": 0.5, "beam": 0.1, "chair": 0.5,
    "column": 0.5, "door": 0.5, "sofa": 0.1, "table": 0.1, "window": 0.5,
    "ceiling": 0.01, "floor": 0.01, "wall": 0.01,
}

CLASS_TO_COLOR_RGB = {
    0: (200, 200, 200),   # clutter
    1: (0, 100, 100),     # board
    2: (255, 0, 0),       # bookcase
    3: (255, 200, 200),   # beam
    4: (0, 0, 100),       # chair
    5: (0, 255, 255),     # column
    6: (0, 100, 0),       # door
    7: (255, 0, 255),     # sofa
    8: (50, 50, 50),      # table
    9: (0, 255, 0),       # window
    10: (255, 255, 0),    # ceiling
    11: (0, 0, 255),      # floor
    12: (255, 165, 0),    # wall
}
_rng = np.random.RandomState(0)
for _i in range(13, max(len(CLASSES_S3DIS), len(CLASSES_NYU40), len(CLASSES_KITTI))):
    CLASS_TO_COLOR_RGB[_i] = tuple(int(c) for c in _rng.randint(0, 255, 3))


def classes_for_area(area: str):
    """Pick the class vocabulary the way the reference drivers do
    (``test_region_grow.py:100``)."""
    if "kitti" in area:
        return CLASSES_KITTI
    if area == "scannet":
        return CLASSES_NYU40
    return CLASSES_S3DIS
