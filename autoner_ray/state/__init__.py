from autoner_ray.state.trie import KBTrie, load_kb, clean_stopwords, build_trie  # noqa: F401
