"""Convert a reference (torch) checkpoint into this framework's format.

Usage:
    python tools/convert_ckpt.py --model PSMNet \
        --src PSMNet_epoch_64.pth --dst psmnet_sceneflow.msgpack

The output is a flax-serialized {'params', 'batch_stats'} tree, loadable via
``MODEL.PRETRAINED_MODEL`` in a YAML config (the TPU counterpart of the
reference's pretrained-load path, reference stereo/utils/common_utils.py:142-180)
or directly with ``openstereo_tpu.runtime.load_variables``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openstereo_tpu.utils.torch_convert import (  # noqa: E402
    CONVERTERS, convert, load_torch_state_dict, nest_tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, choices=sorted(CONVERTERS))
    ap.add_argument("--src", required=True, help="reference .pth checkpoint")
    ap.add_argument("--dst", required=True, help="output .msgpack path")
    ap.add_argument("--prefix", default="",
                    help="nest the converted tree under this path, e.g. "
                         "'backbone/trunk' to drop a TimmMobileNetV2 trunk "
                         "into LightStereo ('feature/trunk' for IGEV, "
                         "'trunk' for CoEx)")
    args = ap.parse_args()

    from flax import serialization

    sd = load_torch_state_dict(args.src)
    variables = nest_tree(convert(args.model, sd), args.prefix)
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(variables))
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(variables))
    print(f"wrote {args.dst}: {n:,} values")


if __name__ == "__main__":
    main()
