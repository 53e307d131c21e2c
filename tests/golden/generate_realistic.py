"""Genome-realistic counting golden generator: runs the REFERENCE
ExInCounter (via tests/golden/pysam_shim.py) on the deterministic
fixture from realistic.py and freezes per-logic matrix DIGESTS
(sha256 + sums) -- the fixture regenerates from its seed, so only the
small digest file is committed.

Run:  python tests/golden/generate_realistic.py [mid|full|all]
Writes tests/golden/realistic_golden.npz (merging existing configs).
"""
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)                             # pysam_shim, realistic
sys.path.insert(0, os.path.join(HERE, ".."))         # tests/
sys.path.insert(0, os.path.join(HERE, "..", ".."))   # repo root

from generate_counting import _install_stubs         # noqa: E402
import realistic                                     # noqa: E402

LOGICS = ["Permissive10X", "ValidatedIntrons10X", "Discordant10X",
          "Stricter10X", "Intermediate10X", "ObservedSpanning10X"]
OUT = os.path.join(HERE, "realistic_golden.npz")
REF_DIR = os.environ.get("VTPU_REFERENCE_DIR", "/root/reference")


def main(configs):
    _install_stubs()
    sys.path.insert(0, REF_DIR)
    import velocyto as vcy

    merged = {}
    if os.path.exists(OUT):
        merged = {k: v for k, v in np.load(OUT, allow_pickle=True).items()}

    for config in configs:
        cfg = realistic.CONFIGS[config]
        t0 = time.time()
        paths = realistic.build(HERE if config == "mid" else "/tmp",
                                config)
        print(f"[{config}] fixture built in {time.time()-t0:.0f}s",
              flush=True)
        bcs = {realistic._bc(c) for c in range(cfg["n_cells"])}
        for logic_name in LOGICS:
            for use_mask in (False, True):
                t1 = time.time()
                counter = vcy.ExInCounter(
                    "s", getattr(vcy, logic_name), valid_bcset=set(bcs))
                counter.peek(paths["bam"])
                counter.read_transcriptmodels(paths["gtf"])
                if use_mask:
                    counter.read_repeats(paths["mask"])
                counter.mark_up_introns([paths["bam"]], multimap=False)
                d, cells = counter.count([paths["cs"]], multimap=False,
                                         cell_batch_size=100)
                layers = {layer: (np.concatenate(arrs, axis=1) if arrs
                                  else np.zeros((len(counter.geneid2ix),
                                                 0), np.uint32))
                          for layer, arrs in d.items()}
                dig = realistic.matrix_digest(layers, list(cells))
                key = f"{config}__{logic_name}" + \
                    ("_mask" if use_mask else "")
                merged[key] = np.array(json.dumps(dig))
                print(f"[{config}] {key}: "
                      f"{ {k: v for k, v in dig.items() if k.endswith('_sum')} } "
                      f"({time.time()-t1:.0f}s)", flush=True)

        # --- umi-extension "chr" (dropest mode) on the same fixture ---
        t1 = time.time()
        counter = vcy.ExInCounter("s", vcy.Permissive10X,
                                  valid_bcset=set(bcs),
                                  umi_extension="chr")
        counter.peek(paths["bam"])
        counter.read_transcriptmodels(paths["gtf"])
        counter.mark_up_introns([paths["bam"]], multimap=False)
        d, cells = counter.count([paths["cs"]], multimap=False,
                                 cell_batch_size=100)
        layers = {layer: (np.concatenate(arrs, axis=1) if arrs
                          else np.zeros((len(counter.geneid2ix), 0),
                                        np.uint32))
                  for layer, arrs in d.items()}
        key = f"{config}__Permissive10X_umichr"
        merged[key] = np.array(json.dumps(
            realistic.matrix_digest(layers, list(cells))))
        print(f"[{config}] {key} done ({time.time()-t1:.0f}s)", flush=True)

        # --- SmartSeq2 onefilepercell (one bam per cell, placeholder
        # UMIs, unstranded, 4th 'spanning' layer) ---
        t1 = time.time()
        gtf_path, percell = realistic.build_percell(
            HERE if config == "mid" else "/tmp", config)
        counter = vcy.ExInCounter("s", vcy.SmartSeq2, valid_bcset=None,
                                  onefilepercell=True,
                                  umi_extension="without_umi")
        counter.read_transcriptmodels(gtf_path)
        counter.mark_up_introns(percell, multimap=False)   # no-op markup
        d, cells = counter.count(percell, multimap=False,
                                 cell_batch_size=100)
        layers = {layer: (np.concatenate(arrs, axis=1) if arrs
                          else np.zeros((len(counter.geneid2ix), 0),
                                        np.uint32))
                  for layer, arrs in d.items()}
        # barcodes are the bam paths: digest the workdir-independent form
        cellnames = [os.path.basename(str(c)) for c in cells]
        key = f"{config}__SmartSeq2_ofpc"
        merged[key] = np.array(json.dumps(
            realistic.matrix_digest(layers, cellnames)))
        print(f"[{config}] {key} done ({time.time()-t1:.0f}s)", flush=True)

    np.savez_compressed(OUT, **merged)
    print(f"wrote {OUT}: {sorted(merged)}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "mid"
    main(list(realistic.CONFIGS) if which == "all" else [which])
