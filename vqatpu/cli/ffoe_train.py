"""FFOE training CLI (reference ``src/FFOE/main.py``).

Usage:  python -m vqatpu.cli.ffoe_train --model cti --dataroot data_vqa ...
"""

from __future__ import annotations

import argparse
import os

import jax

from vqatpu.cli.common import (
    add_common_args,
    maybe_init_distributed,
    model_config_from_args,
    train_config_from_args,
    validate_args,
)
from vqatpu.data import (
    ConcatDataset,
    Dictionary,
    TDIUCFeatureDataset,
    VisualGenomeFeatureDataset,
    VQAFeatureDataset,
)
from vqatpu.data.tfidf import tfidf_loading
from vqatpu.models import build_model
from vqatpu.train.checkpoints import restore_train_state
from vqatpu.train.loop import train
from vqatpu.train.steps import make_train_state


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    validate_args(args)
    maybe_init_distributed(args)
    dataroot = args.TDIUC_dir if args.use_TDIUC else args.dataroot
    dictionary = Dictionary.load_from_file(os.path.join(dataroot, "dictionary.pkl"))
    if args.use_TDIUC:
        train_dset = TDIUCFeatureDataset(
            "train", dictionary, dataroot=dataroot, max_boxes=args.max_boxes,
            question_len=args.question_len, distillation=args.distillation,
            features_in_memory=not args.stream_features,
            quantize_features=args.quantize_store)
        val_dset = TDIUCFeatureDataset(
            "val", dictionary, dataroot=dataroot, max_boxes=args.max_boxes,
            question_len=args.question_len,
            features_in_memory=not args.stream_features,
            quantize_features=args.quantize_store)
    else:
        train_dset = VQAFeatureDataset(
            "train", dictionary, dataroot=dataroot, max_boxes=args.max_boxes,
            question_len=args.question_len, distillation=args.distillation,
            features_in_memory=not args.stream_features,
            quantize_features=args.quantize_store)
        val_dset = VQAFeatureDataset(
            "val", dictionary, dataroot=dataroot, max_boxes=args.max_boxes,
            question_len=args.question_len,
            features_in_memory=not args.stream_features,
            quantize_features=args.quantize_store)

    mcfg = model_config_from_args(args, train_dset)
    tcfg = train_config_from_args(args, saving_epoch=9)
    model = build_model(mcfg)

    state = make_train_state(model, jax.random.PRNGKey(args.seed),
                             tfidf_loaded=bool(args.tfidf))
    # tf-idf GloVe init on every word-embedding table
    if args.tfidf:
        target = ("TDIUC",) if args.use_TDIUC else ("vqa",)
        names = ("train", "val") if args.use_TDIUC else ("train", "val", "test2015")
        params = dict(state.params)
        for key in ("w_emb", "wa_emb"):
            if key in params:
                params[key] = tfidf_loading(model.w_emb, params[key], dataroot,
                                            dictionary, names=names, target=target)
        state = state._replace(params=params)

    start_epoch, best_eval = 0, 0.0
    if args.input is not None:
        state, start_epoch, ck_extra = restore_train_state(args.input, state)
        best_eval = float(ck_extra.get("best_eval", 0.0))

    if args.use_both:
        parts = [train_dset, val_dset]
        if args.use_vg:
            parts += [
                VisualGenomeFeatureDataset("train", train_dset.store,
                                           dictionary, dataroot=dataroot,
                                           max_boxes=args.max_boxes,
                                           img_id2idx=train_dset.img_id2idx),
                VisualGenomeFeatureDataset("val", val_dset.store,
                                           dictionary, dataroot=dataroot,
                                           max_boxes=args.max_boxes,
                                           img_id2idx=val_dset.img_id2idx),
            ]
        train_ds, eval_ds = ConcatDataset(parts), None
    else:
        train_ds, eval_ds = train_dset, val_dset

    train(model, train_ds, eval_ds, tcfg, args.output,
          state=state, start_epoch=start_epoch, best_eval=best_eval,
          tfidf_loaded=bool(args.tfidf), use_mesh=not args.no_mesh,
          print_interval=args.print_interval,
          use_native_loader=args.native_loader,
          profile_dir=args.profile_dir,
          num_devices=args.num_devices, tp=args.tp)


if __name__ == "__main__":
    main()
