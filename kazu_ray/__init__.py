"""kazu_ray — a from-scratch, Ray-Data-native biomedical knowledge-graph
construction engine with the query/data-processing capabilities of the
reference KAZU pipeline (/root/reference).

Architecture: every stage is a ``ray.data.Dataset`` transform —
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages (dictionary automata, NER models, linking indices), and
groupby/aggregate shuffles only where semantics require them (dictionary
compile, triple canonicalization).  See SURVEY.md for the operator
inventory and the reference-file citations.
"""

__version__ = "0.1.0"
