"""PartNet hierarchy-list parser for the hierarchical CosFace loss.

Behavioral reference: /root/reference/hpcs/data/hierarchy_list.py:9-60 —
parses after_merging_label_ids/{Cat}.txt (tree with 'leaf' markers) plus the
per-level {Cat}-level-{L}.txt files into per-level branch lists of leaf ids,
then remaps leaves to consecutive channel indices.
"""
import os


def get_leaves(hierarchy_root, category):
    with open(os.path.join(hierarchy_root, f"{category}.txt")) as fin:
        lines_hier = fin.readlines()
    leaves = [i + 1 for i, line in enumerate(lines_hier) if "leaf" in line]
    return leaves, lines_hier


def get_hierarchy_level(leaves, lines_level, lines_hier):
    numbers = [int(line[:2]) for line in lines_level]
    numbers.append(len(lines_hier) + 1)
    level_numbers = []
    for index in range(len(numbers) - 1):
        level = list(range(numbers[index], numbers[index + 1])) or [numbers[index]]
        level_numbers.append(level)
    return [sorted(set(item) & set(leaves)) for item in level_numbers]


def remap_leaves(hierarchy_list):
    """Relabel leaf node ids to consecutive channel indices, in traversal
    order per level (reference remap_leaves :53-60)."""
    remapped = []
    for branch in hierarchy_list:
        i = 0
        new_branch = []
        for channel in branch:
            new_channel = []
            for _ in channel:
                new_channel.append(i)
                i += 1
            new_branch.append(new_channel)
        remapped.append(new_branch)
    return remapped


def get_hierarchy_list(hierarchy_root, category, levels):
    leaves, lines_hier = get_leaves(hierarchy_root, category)
    hierarchy_list = []
    for level in levels:
        with open(os.path.join(hierarchy_root, f"{category}-level-{level}.txt")) as fin:
            lines_level = fin.readlines()
        hierarchy_list.append(get_hierarchy_level(leaves, lines_level, lines_hier))
    return remap_leaves(hierarchy_list)
