from .pagerank import pagerank, pagerank_result  # noqa: F401
