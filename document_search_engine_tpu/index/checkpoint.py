"""Index checkpoint save/load (SURVEY.md §5 "Checkpoint/resume").

Layout: one directory per index —
    config.json            IndexConfig (self-describing index)
    meta.json              n_docs_total, segment count
    segment_<i>.npz        all host + device arrays of one segment

Plain npz + json: rebuildable, inspectable, no framework lock-in. Resume
is `device_put` of the stored arrays (with the same doc-sharding in the
distributed path).
"""
from __future__ import annotations

import json
import os

import numpy as np


def save_engine(engine, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(engine.config.to_json())
    meta = {
        "n_docs_total": engine.n_docs_total,
        "n_segments": len(engine.segments),
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    for i, (host, device) in enumerate(engine.segments):
        np.savez_compressed(
            os.path.join(path, f"segment_{i}.npz"),
            term_hash=host.term_hash,
            df=host.df,
            doc_base=np.int64(host.doc_base),
            n_docs=np.int64(host.n_docs),
            dl=host.dl,
            alive=host.alive,
            doc_hashes=host.doc_hashes,
            doc_tfs=host.doc_tfs,
            doc_ptr=host.doc_ptr,
            indptr=host.indptr,
            post_doc=np.asarray(device.post_doc),
            post_tf=np.asarray(device.post_tf),
            post_val=np.asarray(device.post_val),
            dev_dl=np.asarray(device.dl),
            dev_alive=np.asarray(device.alive),
            dev_inv_norm=np.asarray(device.inv_norm),
        )


def load_engine(path: str, engine_cls=None):
    import jax.numpy as jnp

    from ..config import IndexConfig
    from .csr import SegmentDevice, SegmentHost, merge_stats

    if engine_cls is None:
        from ..engine.engine import SearchEngine as engine_cls

    with open(os.path.join(path, "config.json")) as f:
        config = IndexConfig.from_json(f.read())
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    engine = engine_cls(config)
    engine.n_docs_total = int(meta["n_docs_total"])
    for i in range(int(meta["n_segments"])):
        z = np.load(os.path.join(path, f"segment_{i}.npz"))
        nnz = int(z["indptr"][-1]) if len(z["indptr"]) else 0
        host = SegmentHost(
            term_hash=z["term_hash"],
            df=z["df"],
            doc_base=int(z["doc_base"]),
            n_docs=int(z["n_docs"]),
            dl=z["dl"],
            alive=z["alive"],
            doc_hashes=z["doc_hashes"],
            doc_tfs=z["doc_tfs"],
            doc_ptr=z["doc_ptr"],
            indptr=z["indptr"],
            post_doc=z["post_doc"][:nnz],
            post_tf=z["post_tf"][:nnz].astype(np.int32),
        )
        device = SegmentDevice(
            indptr=jnp.asarray(z["indptr"]),
            post_doc=jnp.asarray(z["post_doc"]),
            post_tf=jnp.asarray(z["post_tf"]),
            post_val=jnp.asarray(z["post_val"]),
            dl=jnp.asarray(z["dev_dl"]),
            alive=jnp.asarray(z["dev_alive"]),
            inv_norm=jnp.asarray(z["dev_inv_norm"]),
        )
        engine.segments.append([host, device])
    engine.stats = merge_stats([h for h, _ in engine.segments])
    return engine
