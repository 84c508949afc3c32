"""Built-in dataset metadata.

Parity with `datasets/builtin_meta.py` (the piece the detection path uses:
the 80 COCO thing classes in contiguous order, feeding the zero-shot COCO
caption `".".join(classes) + "."` — `config/configs/common/data/coco_detr.py:
13-21`). VOC lives in `data/incremental_voc.py`; LVIS's 1203 names load from
the dataset json at runtime (`CocoDataset.from_json` handles LVIS-format
category lists unchanged).
"""

COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports ball", "kite",
    "baseball bat", "baseball glove", "skateboard", "surfboard",
    "tennis racket", "bottle", "wine glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot dog", "pizza", "donut", "cake", "chair", "couch", "potted plant",
    "bed", "dining table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

assert len(COCO_CLASSES) == 80


def coco_caption() -> str:
    """The zero-shot COCO caption (`coco_detr.py:13-21` builds exactly this
    through the mapper)."""
    return ".".join(COCO_CLASSES) + "."
