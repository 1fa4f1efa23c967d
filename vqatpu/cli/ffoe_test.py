"""FFOE inference/export CLI (reference ``src/FFOE/test.py``): batched logit
sweep -> EvalAI JSON (+ CTI teacher-logit pkl for the KD loop)."""

from __future__ import annotations

import argparse
import os

import jax

from vqatpu.cli.common import add_common_args, model_config_from_args, validate_args
from vqatpu.data import Dictionary, TDIUCFeatureDataset, VQAFeatureDataset, make_eval_loader
from vqatpu.eval import export_results, get_logits
from vqatpu.models import build_model
from vqatpu.train.checkpoints import load_params_any


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--split", type=str, default="test2015")
    parser.add_argument("--logits", type=bool, default=False)
    parser.add_argument("--debug", action="store_true", default=False,
                        help="echo the first question/predicted answer "
                             "(reference test.py:55-66)")
    parser.add_argument("--epoch", type=str, default="12")
    parser.add_argument("--results", type=str, default="results")
    parser.add_argument("--label", type=str, default="",
                        help="ensemble member tag: raw dumps go to "
                             "logits/<model><op><num_hid>_<label>/ "
                             "(reference test.py:172-175)")
    parser.add_argument("--index", type=int, default=0,
                        help="ensemble member index within --label")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    validate_args(args)
    dataroot = args.TDIUC_dir if args.use_TDIUC else args.dataroot
    dictionary = Dictionary.load_from_file(os.path.join(dataroot, "dictionary.pkl"))
    ds_cls = TDIUCFeatureDataset if args.use_TDIUC else VQAFeatureDataset
    eval_dset = ds_cls(args.split, dictionary, dataroot=dataroot,
                       max_boxes=args.max_boxes, question_len=args.question_len,
                       features_in_memory=not args.stream_features,
                       quantize_features=args.quantize_store)

    mcfg = model_config_from_args(args, eval_dset)
    model = build_model(mcfg)

    params = jax.tree.map(jax.numpy.asarray,
                          load_params_any(args.input, args.epoch, model))

    # sweep with HBM-resident features: the loader ships only row
    # indices, the jitted eval gathers v/b on device (bit-identical
    # logits — tests/test_device_store.py::test_eval_matches_wire).
    # Tri-state: auto (default, on when capable + fits budget) / on / off.
    from vqatpu.data.device_store import DeviceFeatureStore, \
        devstore_decision
    dev_store = None
    build, why = devstore_decision(eval_dset, args.device_features,
                                   args.transfer_dtype,
                                   shard=args.shard_feature_store)
    if build:
        dev_store = DeviceFeatureStore.build(
            eval_dset, transfer_dtype=args.transfer_dtype)
        print(f"device feature store: {dev_store.describe()}")
    elif why:
        print(f"device feature store OFF ({why}); using host wire")
    loader = make_eval_loader(eval_dset, args.batch_size,
                              use_native=args.native_loader,
                              quantize=(args.transfer_dtype == "int8"),
                              fields_only=dev_store is not None)
    logits, qids = get_logits(model, params, loader,
                              compute_dtype=args.compute_dtype,
                              transfer_dtype=args.transfer_dtype,
                              dev_store=dev_store)
    if args.debug:
        e = eval_dset.entries[0]
        idx2word = dictionary.idx2word
        toks = [idx2word[t] if t < len(idx2word) else "_" for t in e["q_token"]]
        pred = eval_dset.label2ans[int(logits[0].argmax())]
        print(" ".join(toks))
        print(pred)
    paths = export_results(args.results, args.split, args.model, args.op,
                           args.num_hid, args.epoch, logits, qids,
                           eval_dset.label2ans,
                           dump_teacher_logits=(args.model == "cti"))
    if args.logits:
        # raw logit dump (reference test.py:173-175 saves a .pth tensor);
        # with --label the path mirrors the reference's ensemble layout so
        # vqatpu-ensemble can glob the members
        import numpy as np
        if args.label:
            member_dir = os.path.join(
                args.results, "logits",
                f"{args.model}{args.op}{args.num_hid}_{args.label}")
            os.makedirs(member_dir, exist_ok=True)
            raw = os.path.join(member_dir, f"logits{args.index}.npz")
            # the member path mirrors the reference layout (no split
            # component, test.py:172-175) — so dumping a second split at the
            # same label/index would silently clobber the first; refuse
            if os.path.exists(raw):
                raise SystemExit(
                    f"refusing to overwrite {raw}: pick a different "
                    "--index (or --label) per member dump")
        else:
            raw = os.path.join(args.results,
                               f"{args.split}_{args.model}_logits.npz")
        np.savez(raw, logits=logits, question_ids=qids)
        paths["raw_logits"] = raw
    for kind, path in paths.items():
        print(f"wrote {kind}: {path}")


if __name__ == "__main__":
    main()
