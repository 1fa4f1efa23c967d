"""MC (Visual7W) evaluation CLI (reference ``src/MC/test.py``): x4 candidate
expansion sweep, prints accuracy."""

from __future__ import annotations

import argparse
import os

import jax

from vqatpu.cli.common import add_common_args, model_config_from_args, validate_args
from vqatpu.data import Dictionary, V7WDataset, make_eval_loader
from vqatpu.eval import evaluate_mc
from vqatpu.models import build_model
from vqatpu.train.checkpoints import load_params_any


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--epoch", type=str, default="12")
    parser.add_argument("--use_feature", type=str, default="bottom-up",
                        choices=["bottom-up", "grid"])
    parser.set_defaults(batch_size=64, dataroot="data_v7w")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    validate_args(args)
    dictionary = Dictionary.load_from_file(
        os.path.join(args.dataroot, "dictionary.pkl"))
    eval_dset = V7WDataset(args.split, dictionary, dataroot=args.dataroot,
                           max_boxes=args.max_boxes,
                           question_len=args.question_len,
                           use_feature=args.use_feature,
                           features_in_memory=not args.stream_features,
                           quantize_features=args.quantize_store)

    mcfg = model_config_from_args(args, eval_dset, task="mc")
    model = build_model(mcfg)

    params = jax.tree.map(jax.numpy.asarray,
                          load_params_any(args.input, args.epoch, model))

    # sweep with HBM-resident features: the loader ships only row
    # indices, the x4 expansion tiles them, the jitted gather
    # materializes the expanded slabs (bit-identical accuracy —
    # tests/test_device_store.py::test_mc_eval_matches_wire).
    # Tri-state: auto (default, on when capable + fits budget) / on / off.
    from vqatpu.data.device_store import DeviceFeatureStore, \
        devstore_decision
    dev_store = None
    build, why = devstore_decision(eval_dset, args.device_features,
                                   args.transfer_dtype, task="mc",
                                   shard=args.shard_feature_store)
    if build:
        dev_store = DeviceFeatureStore.build(
            eval_dset, transfer_dtype=args.transfer_dtype)
        print(f"device feature store: {dev_store.describe()}")
    elif why:
        print(f"device feature store OFF ({why}); using host wire")
    acc, _ = evaluate_mc(model, params,
                         make_eval_loader(eval_dset, args.batch_size,
                                          use_native=args.native_loader,
                                          quantize=(args.transfer_dtype
                                                    == "int8"),
                                          fields_only=dev_store is not None),
                         compute_dtype=args.compute_dtype,
                         transfer_dtype=args.transfer_dtype,
                         dev_store=dev_store)
    print(f"{args.split} accuracy: {100 * acc:.2f}")


if __name__ == "__main__":
    main()
