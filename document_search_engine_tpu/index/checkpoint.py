"""Index checkpoint save/load (SURVEY.md §5 "Checkpoint/resume").

Layout: one directory per index —
    config.json            IndexConfig (self-describing index)
    meta.json              n_docs_total, segment count, converged
                           plan-cache layouts (zero-grow warm start)
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
        "format_version": 2,  # v2: 128-aligned (X, 128) posting planes
    }
    # converged plan layouts ride along (round-4 VERDICT #5): a loaded
    # index replays its serving traffic with ZERO layout grows — each
    # restored layout compiles once (a disk hit when the persistent
    # compile cache is warm) instead of re-paying growth generations
    if getattr(engine, "plan_cache", None) is not None:
        meta["plan_layouts"] = engine.plan_cache.to_jsonable()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    for i, (host, device) in enumerate(engine.segments):
        arrays = dict(
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
            row_start=host.row_start,
            plane_doc=np.asarray(device.post_doc),
            plane_val=np.asarray(device.post_val),
            plane_tf=np.asarray(device.post_tf),
            dev_dl=np.asarray(device.dl),
            dev_alive=np.asarray(device.alive),
            dev_inv_norm=np.asarray(device.inv_norm),
        )
        # device-built segments keep no host postings copies (derivable
        # from the analyzed docs; the device planes are saved above)
        if host.post_doc is not None:
            arrays["post_doc"] = host.post_doc
            arrays["post_tf"] = host.post_tf
        np.savez_compressed(
            os.path.join(path, f"segment_{i}.npz"), **arrays
        )


def _save_host(host, fname: str) -> None:
    arrays = dict(
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
    )
    # device-built shards keep no host postings copies; the loader
    # rebuilds them from the analyzed doc arrays (fully derivable)
    if host.post_doc is not None:
        arrays["host_post_doc"] = host.post_doc
        arrays["host_post_tf"] = host.post_tf
    np.savez_compressed(fname, **arrays)


def _load_host(fname: str):
    from . import builder
    from .csr import SegmentHost

    z = np.load(fname)
    if "host_post_doc" not in z.files:
        # device-built shard: re-derive the host CSR from the analyzed
        # docs (same lexsort as the original pack — bit-identical)
        a = builder.AnalyzedDocs(
            hashes=z["doc_hashes"],
            tfs=z["doc_tfs"],
            doc_ptr=z["doc_ptr"],
            dl=z["dl"],
        )
        h = builder.build_host_segment(a, int(z["doc_base"]))
        h.alive[:] = z["alive"]
        builder.recompute_alive_df(h)
        return h
    return SegmentHost(
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
        post_doc=z["host_post_doc"],
        post_tf=z["host_post_tf"],
    )


def save_sharded(engine, path: str) -> None:
    """Checkpoint a DistributedSearchEngine: config + one host-metadata
    npz per shard (device arrays are fully derivable — assemble_sharded
    rebuilds them on load, for ANY mesh size)."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(engine.config.to_json())
    hosts = engine.index.hosts if engine.index else []
    meta = {"n_shards": len(hosts), "sharded": True, "format_version": 2}
    # converged plan layouts (see save_engine); keys embed the mesh
    # size and padded geometry, so layouts restored onto a different
    # mesh are simply never matched (and elastic reshard re-converges)
    if getattr(engine, "plan_cache", None) is not None:
        meta["plan_layouts"] = engine.plan_cache.to_jsonable()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    for i, h in enumerate(hosts):
        _save_host(h, os.path.join(path, f"shard_{i}.npz"))


def load_sharded(path: str, mesh=None):
    """Reopen a sharded checkpoint on `mesh` — elastically resharding if
    the mesh size differs from the saved shard count: docs are
    re-partitioned into contiguous global-id ranges, alive flags carry
    over, and df is recounted over alive docs, so results are
    bit-identical across topologies (tested)."""
    from ..config import IndexConfig
    from ..parallel.dist import DistributedSearchEngine, assemble_sharded
    from ..parallel.mesh import make_mesh
    from . import builder

    with open(os.path.join(path, "config.json")) as f:
        config = IndexConfig.from_json(f.read())
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("format_version", 0) != 2 or not meta.get("sharded"):
        raise ValueError(
            "not a sharded checkpoint (open with SearchEngine.load?)"
        )
    hosts = [
        _load_host(os.path.join(path, f"shard_{i}.npz"))
        for i in range(int(meta["n_shards"]))
    ]
    engine = DistributedSearchEngine(config, mesh=mesh or make_mesh())
    if not hosts:  # checkpoint of a never-built engine
        return engine
    n_shards = engine.mesh.devices.size
    if n_shards != len(hosts):
        hosts = _reshard_hosts(hosts, n_shards, builder)
    engine.index = assemble_sharded(hosts, config, engine.mesh)
    if meta.get("plan_layouts") and engine.plan_cache is not None:
        engine.plan_cache.load_jsonable(meta["plan_layouts"])
    return engine


def _reshard_hosts(hosts, n_shards: int, builder):
    """Re-split contiguous doc ranges across a new shard count."""
    hosts = sorted(hosts, key=lambda h: h.doc_base)
    hashes = np.concatenate([h.doc_hashes for h in hosts])
    tfs = np.concatenate([h.doc_tfs for h in hosts])
    dl = np.concatenate([h.dl for h in hosts])
    alive = np.concatenate([h.alive for h in hosts])
    ptr_parts = [np.zeros(1, np.int64)]
    acc = 0
    for h in hosts:
        ptr_parts.append(h.doc_ptr[1:] + acc)
        acc += int(h.doc_ptr[-1])
    doc_ptr = np.concatenate(ptr_parts)
    n_docs = len(dl)
    per = -(-n_docs // n_shards) if n_docs else 1
    out = []
    for i in range(n_shards):
        lo, hi = min(i * per, n_docs), min((i + 1) * per, n_docs)
        a = builder.AnalyzedDocs(
            hashes=hashes[doc_ptr[lo] : doc_ptr[hi]],
            tfs=tfs[doc_ptr[lo] : doc_ptr[hi]],
            doc_ptr=doc_ptr[lo : hi + 1] - doc_ptr[lo],
            dl=dl[lo:hi],
        )
        h = builder.build_host_segment(a, lo)
        h.alive[:] = alive[lo:hi]
        builder.recompute_alive_df(h)
        out.append(h)
    return out


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
    if meta.get("format_version", 0) != 2:
        raise ValueError(
            f"unsupported index format_version {meta.get('format_version')}"
        )
    if meta.get("sharded"):
        raise ValueError(
            "this is a sharded checkpoint — open it with "
            "DistributedSearchEngine.load"
        )
    engine = engine_cls(config)
    engine.n_docs_total = int(meta["n_docs_total"])
    for i in range(int(meta["n_segments"])):
        z = np.load(os.path.join(path, f"segment_{i}.npz"))
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
            row_start=z["row_start"],
            post_doc=z["post_doc"] if "post_doc" in z.files else None,
            post_tf=(
                z["post_tf"].astype(np.int32)
                if "post_tf" in z.files
                else None
            ),
        )
        device = SegmentDevice(
            indptr=jnp.asarray(z["indptr"]),
            row_start=jnp.asarray(z["row_start"].astype(np.int32)),
            post_doc=jnp.asarray(z["plane_doc"]),
            post_val=jnp.asarray(z["plane_val"]),
            post_tf=jnp.asarray(z["plane_tf"]),
            dl=jnp.asarray(z["dev_dl"]),
            alive=jnp.asarray(z["dev_alive"]),
            inv_norm=jnp.asarray(z["dev_inv_norm"]),
        )
        engine.segments.append([host, device])
    engine.stats = merge_stats([h for h, _ in engine.segments])
    if meta.get("plan_layouts") and engine.plan_cache is not None:
        engine.plan_cache.load_jsonable(meta["plan_layouts"])
    return engine
