"""MC (Visual7W) training CLI (reference ``src/MC/main.py``)."""

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
from vqatpu.data import Dictionary, V7WDataset
from vqatpu.data.tfidf import tfidf_loading
from vqatpu.models import build_model
from vqatpu.train.checkpoints import restore_train_state
from vqatpu.train.loop import train
from vqatpu.train.steps import make_train_state


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--use_feature", type=str, default="bottom-up",
                        choices=["bottom-up", "grid"])
    parser.set_defaults(batch_size=64, output="saved_models/v7w",
                        dataroot="data_v7w")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    validate_args(args)
    maybe_init_distributed(args)
    dataroot = args.dataroot
    dictionary = Dictionary.load_from_file(os.path.join(dataroot, "dictionary.pkl"))
    train_dset = V7WDataset("train", dictionary, dataroot=dataroot,
                            max_boxes=args.max_boxes,
                            question_len=args.question_len,
                            use_feature=args.use_feature,
                            features_in_memory=not args.stream_features,
                            quantize_features=args.quantize_store)
    val_dset = V7WDataset("val", dictionary, dataroot=dataroot,
                          max_boxes=args.max_boxes,
                          question_len=args.question_len,
                          use_feature=args.use_feature,
                          features_in_memory=not args.stream_features,
                          quantize_features=args.quantize_store)

    mcfg = model_config_from_args(args, train_dset, task="mc")
    tcfg = train_config_from_args(args, saving_epoch=0)  # MC/train.py:29
    model = build_model(mcfg)

    state = make_train_state(model, jax.random.PRNGKey(args.seed),
                             tfidf_loaded=bool(args.tfidf))
    if args.tfidf:
        params = dict(state.params)
        for key in ("w_emb", "wa_emb"):
            if key in params:
                params[key] = tfidf_loading(model.w_emb, params[key], dataroot,
                                            dictionary,
                                            names=("train", "val", "test"),
                                            target=("v7w",))
        state = state._replace(params=params)

    start_epoch, best_eval = 0, 0.0
    if args.input is not None:
        state, start_epoch, ck_extra = restore_train_state(args.input, state)
        best_eval = float(ck_extra.get("best_eval", 0.0))

    train(model, train_dset, val_dset, tcfg, args.output, task="mc",
          state=state, start_epoch=start_epoch, best_eval=best_eval,
          tfidf_loaded=bool(args.tfidf), use_mesh=not args.no_mesh,
          print_interval=args.print_interval,
          use_native_loader=args.native_loader,
          profile_dir=args.profile_dir,
          num_devices=args.num_devices, tp=args.tp)


if __name__ == "__main__":
    main()
