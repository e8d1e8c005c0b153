"""Randomly-connected graph core.

Converts an undirected Watts-Strogatz graph into the DAG executed by the
encoder stages (parity: reference model/graph.py:11-54): node ``i`` receives
inputs from its neighbours with smaller index; it is an *input* node when its
index is below all neighbours and an *output* node when above all of them.

The topology is resolved entirely at module-construction time (host Python)
and unrolled statically at trace time — XLA sees a fixed dataflow graph, so
there is no dynamic control flow on device.

Graph assets can be loaded from the reference's ``.gpickle`` files or from
this framework's plain-JSON edge lists, or built fresh with networkx.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import NamedTuple, Optional, Sequence


class Node(NamedTuple):
    id: int
    node_type: str  # 'input' | 'intermediate' | 'output'
    inputs: tuple[int, ...]


class GraphSpec(NamedTuple):
    """Static, hashable DAG description used as a flax module field."""

    nodes: tuple[Node, ...]
    in_nodes: tuple[int, ...]
    out_nodes: tuple[int, ...]


def graph_spec_from_adjacency(adjacency: Sequence[Sequence[int]]) -> GraphSpec:
    """Build a :class:`GraphSpec` from ordered per-node neighbour lists.

    ⚠ Neighbour ORDER is semantic, not cosmetic: a multi-input node pairs its
    k-th lower-index neighbour with its k-th ``mean_weight`` gate (reference
    model/graph.py:36 keeps the networkx adjacency order, which is insertion
    order — NOT sorted; e.g. the reference's stage graphs give node 3 the
    inputs ``[2, 1, 0]``).  Sorting here would silently re-pair gates with
    inputs: identical forward at init (all gates equal) but wrong gradients
    and wrong trained-checkpoint semantics.
    """
    num_nodes = len(adjacency)
    nodes, ins, outs = [], [], []
    for i in range(num_nodes):
        nbrs = list(adjacency[i])
        node_type = "intermediate"
        if i < min(nbrs):
            ins.append(i)
            node_type = "input"
        elif i > max(nbrs):
            outs.append(i)
            node_type = "output"
        nodes.append(Node(i, node_type, tuple(n for n in nbrs if n < i)))

    return GraphSpec(tuple(nodes), tuple(ins), tuple(outs))


def graph_spec_from_nx(graph) -> GraphSpec:
    """Build a :class:`GraphSpec` from a networkx Graph, preserving its
    adjacency (insertion) order exactly like reference model/graph.py:11-38."""
    return graph_spec_from_adjacency(
        [list(graph.neighbors(i)) for i in range(graph.number_of_nodes())]
    )


def graph_spec_from_edges(num_nodes: int, edges: Sequence[tuple[int, int]]) -> GraphSpec:
    """Build a :class:`GraphSpec` from an undirected edge list, reproducing
    networkx insertion-order adjacency (edge (u, v) appends v to u's list and
    u to v's)."""
    adjacency: list[list[int]] = [[] for _ in range(num_nodes)]
    for u, v in edges:
        if v not in adjacency[u]:
            adjacency[u].append(v)
        if u not in adjacency[v]:
            adjacency[v].append(u)
    return graph_spec_from_adjacency(adjacency)


def build_graph_spec(nodes: int, k: int, p: float, seed: Optional[int] = None) -> GraphSpec:
    """Build a connected Watts-Strogatz graph (reference model/graph.py:41-44)."""
    import networkx as nx

    g = nx.connected_watts_strogatz_graph(nodes, k, p, seed=seed)
    return graph_spec_from_nx(g)


def load_graph_spec(path: str) -> GraphSpec:
    """Load a graph from ``.json`` (ours) or ``.gpickle`` (reference format).

    Both preserve per-node neighbour order (see
    :func:`graph_spec_from_adjacency`).
    """
    if path.endswith(".json"):
        with open(path) as f:
            data = json.load(f)
        if "adjacency" in data:
            return graph_spec_from_adjacency(data["adjacency"])
        return graph_spec_from_edges(data["num_nodes"], [tuple(e) for e in data["edges"]])
    with open(path, "rb") as f:
        g = pickle.load(f)  # a pickled networkx.Graph
    return graph_spec_from_nx(g)


def save_graph_spec(adjacency: Sequence[Sequence[int]], path: str) -> None:
    """Save ordered per-node neighbour lists as JSON."""
    with open(path, "w") as f:
        json.dump(
            {"num_nodes": len(adjacency), "adjacency": [list(a) for a in adjacency]}, f
        )


def resolve_stage_graph(
    stage: int,
    nodes: int = 5,
    p: float = 0.75,
    k: int = 4,
    seed: Optional[int] = None,
    load_graph: Optional[str] = None,
    save_graph: Optional[str] = None,
) -> GraphSpec:
    """Resolve the graph for one encoder stage.

    Mirrors the load/build/save policy of reference model/layers/
    encoder.py:237-254: ``load_graph`` (a directory of per-stage files)
    overrides building; freshly built graphs use ``seed = stage * seed``.
    """
    if load_graph is not None:
        for name in (f"stage_{stage}.json", f"stage_{stage}.gpickle"):
            path = os.path.join(load_graph, name)
            if os.path.exists(path):
                return load_graph_spec(path)
        raise FileNotFoundError(f"no stage_{stage} graph under {load_graph}")

    import networkx as nx

    g = nx.connected_watts_strogatz_graph(
        nodes, k, p, seed=(stage * seed) if seed is not None else None
    )
    spec = graph_spec_from_nx(g)

    if save_graph is not None:
        directory = os.path.join(save_graph, f"nodes_{nodes}_seed_{seed}")
        os.makedirs(directory, exist_ok=True)
        adjacency = [list(g.neighbors(i)) for i in range(g.number_of_nodes())]
        save_graph_spec(adjacency, os.path.join(directory, f"stage_{stage}.json"))

    return spec
