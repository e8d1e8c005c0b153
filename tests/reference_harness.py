"""Import harness for the read-only PyTorch reference at /root/reference.

Golden-value parity tests import the *actual* reference implementation (no
code is copied into this repo) and compare its CPU outputs against our JAX
ops/modules.  The reference depends on torchvision/torchmetrics, which are
not installed — only their names are needed for import, so we stub them.

If the reference tree or torch is unavailable, dependent tests skip.
"""

from __future__ import annotations

import pickle
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_stubs() -> None:
    if "torchvision" in sys.modules:
        return

    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tvu.save_image = lambda *a, **k: None
    tvt = types.ModuleType("torchvision.transforms")
    for name in ("Resize", "ToTensor", "RandomHorizontalFlip", "Compose"):
        setattr(tvt, name, lambda *a, **k: None)
    tv.utils = tvu
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.utils"] = tvu
    sys.modules["torchvision.transforms"] = tvt

    tm = types.ModuleType("torchmetrics")
    tmf = types.ModuleType("torchmetrics.functional")
    tmf.structural_similarity_index_measure = lambda *a, **k: None
    tm.functional = tmf
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.functional"] = tmf


def import_reference():
    """Return a namespace with the reference's model/train packages.

    Raises ImportError (-> pytest.importorskip pattern) when unavailable.
    """
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        raise ImportError("reference tree not mounted")

    _install_stubs()

    import networkx as nx

    if not hasattr(nx, "read_gpickle"):  # removed in networkx 3.x
        nx.read_gpickle = lambda p: pickle.load(open(p, "rb"))
        nx.write_gpickle = lambda g, p: pickle.dump(g, open(p, "wb"))

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    import torch  # noqa: F401

    import model as ref_model  # type: ignore
    import train.loss as ref_loss  # type: ignore
    import train.utils as ref_utils  # type: ignore
    import train.sparsification as ref_spars  # type: ignore

    ns = types.SimpleNamespace(
        model=ref_model,
        loss=ref_loss,
        utils=ref_utils,
        sparsification=ref_spars,
        root=REFERENCE_ROOT,
        graph_dir=f"{REFERENCE_ROOT}/graphs/nodes_5_seed_42",
    )
    return ns
