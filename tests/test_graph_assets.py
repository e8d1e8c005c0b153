"""The shipped JSON graph assets must encode exactly the reference's
gpickle topologies — including per-node neighbour ORDER, which is semantic
(it pairs inputs with mean_weight gates, see models/graph.py docstring).

This is the assets-equality pin docs/COMPONENTS.md row 33 refers to.
"""

import os
import pickle

import pytest

from uncertainty_model_tpu.models.graph import load_graph_spec

pytestmark = [pytest.mark.golden]

REPO_GRAPHS = os.path.join(os.path.dirname(__file__), "..", "graphs",
                           "nodes_5_seed_42")
REF_GRAPHS = "/root/reference/graphs/nodes_5_seed_42"


@pytest.mark.skipif(not os.path.isdir(REF_GRAPHS),
                    reason="reference checkout not available")
@pytest.mark.parametrize("stage", [1, 2, 3, 4, 5])
def test_json_assets_equal_reference_gpickles(stage):
    ours = load_graph_spec(os.path.join(REPO_GRAPHS, f"stage_{stage}.json"))
    theirs = load_graph_spec(os.path.join(REF_GRAPHS, f"stage_{stage}.gpickle"))
    assert ours == theirs


@pytest.mark.skipif(not os.path.isdir(REF_GRAPHS),
                    reason="reference checkout not available")
@pytest.mark.parametrize("stage", [1, 2, 3, 4, 5])
def test_adjacency_order_matches_networkx(stage):
    """Raw neighbour order in the JSON equals the networkx insertion order
    inside the reference pickle (not merely the same edge set)."""
    import json

    with open(os.path.join(REPO_GRAPHS, f"stage_{stage}.json")) as f:
        ours = json.load(f)["adjacency"]
    with open(os.path.join(REF_GRAPHS, f"stage_{stage}.gpickle"), "rb") as f:
        g = pickle.load(f)
    theirs = [list(g.neighbors(i)) for i in range(g.number_of_nodes())]
    assert ours == theirs
