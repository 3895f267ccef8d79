"""Train/test split from CD-HIT sequence-similarity clusters.

Ref parity: point_vs/dataset_generation/split_by_cdhit_output.py — build a
similarity graph from the .clstr output, then move whole connected
components into the held-out split so no two similar proteins straddle the
boundary.
"""
from __future__ import annotations

import argparse
import random
from collections import defaultdict, deque, namedtuple
from pathlib import Path


def bfs(graph, source):
    """All nodes in the same connected component as ``source``."""
    visited = {source}
    queue = deque(graph[source])
    while queue:
        node = queue.popleft()
        if node not in visited:
            visited.add(node)
            queue += graph[node]
    return visited


def cdhit_output_to_graph(fname):
    """CD-HIT .clstr file -> {pdbid: similar pdbids} adjacency."""
    graph = defaultdict(deque)
    cluster = set()

    def flush():
        for member in cluster:
            graph[member] += list(cluster.difference({member}))
        cluster.clear()

    with open(Path(fname).expanduser(), 'r', encoding='utf-8') as f:
        for line in f:
            if line.startswith('>Cluster'):
                flush()
            else:
                cluster.add(line.split('>')[-1].split('_')[0])
    flush()
    return {key: deque(set(val)) for key, val in graph.items()}


Dataset = namedtuple('Dataset', ['train', 'val'])


def generate_split(graph, training_frac: float, seed=None) -> Dataset:
    rng = random.Random(seed)
    train = set(graph.keys())
    total = len(train)
    val = set()
    while len(val) / total < 1 - training_frac:
        source = rng.sample(tuple(train), 1)[0]
        component = bfs(graph, source)
        train.discard(source)
        train -= component
        val.add(source)
        val.update(component)
    return Dataset(train, val)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('cdhit_output', help='CD-HIT xxx.out.clstr file')
    ap.add_argument('train_frac', type=float)
    args = ap.parse_args(argv)
    graph = cdhit_output_to_graph(args.cdhit_output)
    dataset = generate_split(graph, args.train_frac)
    base = Path(args.cdhit_output).name.split('.')[0]
    Path(base + '.train').write_text('\n'.join(sorted(dataset.train)))
    Path(base + '.test').write_text('\n'.join(sorted(dataset.val)))


if __name__ == '__main__':
    main()
