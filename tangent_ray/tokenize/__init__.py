from tangent_ray.tokenize.porter import porter_stem
from tangent_ray.tokenize.text import tokenize_text
from tangent_ray.tokenize.slt import SLTNode, parse_slt, slt_tuples, tuple_term

__all__ = ["porter_stem", "tokenize_text", "SLTNode", "parse_slt", "slt_tuples", "tuple_term"]
