from .wordcount import wordcount
from .sortops import total_sort, global_rank
from .inverted_index import inverted_index, inverted_index_from_text

__all__ = [
    "wordcount",
    "total_sort",
    "global_rank",
    "inverted_index",
    "inverted_index_from_text",
]
