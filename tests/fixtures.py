"""The reference's canned micro-inputs, replicated verbatim (FIXTURES.md §A).

These are test *data* (not code) from the reference repo's upload
scripts; golden outputs below are hand-computable from the reference
job semantics.
"""

# trace-wordcount-job/upload-wordcount-input.sh:9-20 (= wordcount_sample.txt)
WORDCOUNT_LINES = [
    "The quick brown fox jumps over the lazy dog.",
    "The quick brown fox is fast and clever.",
    "Lazy dogs don't jump over quick foxes.",
    "The fox and the dog became friends in the forest.",
    "Every morning, the quick fox would race with the lazy dog.",
    "Sometimes the dog won, but usually the fox was faster.",
    "One day, a clever crow watched them from a tall tree.",
    "She wondered who would win the next morning’s race.",
    "In the end, they both sat under the sun, tired but happy.",
]

# hand-computed with reference semantics (lower + strip [^a-z]); spot
# checks from FIXTURES.md §A1
WORDCOUNT_GOLDEN_SPOT = {
    "the": 13,
    "fox": 5,
    "quick": 4,
    "dog": 4,
    "dont": 1,
    "mornings": 1,
}
WORDCOUNT_TOTAL_TOKENS = 87

# trace-sort-job/upload-test-input.sh:11-23 (= input.txt)
SORT_LINES = [
    "orange",
    "apple",
    "banana",
    "grape",
    "kiwi",
    "pear",
    "mango",
    "pineapple",
    "lemon",
    "strawberry",
]
SORT_GOLDEN = sorted(SORT_LINES)

# trace-insertindex-job/upload-insertindex-input.sh:13-20
# (insertindex-input-parts/part-{1..5,special}.txt)
INSERTINDEX_LINES = [
    f"{w}\tdoc{i}" for i in range(1, 6) for w in ("apple", "banana", "cat")
] + ["zebra\tdoc6"]

INSERTINDEX_GOLDEN = {
    "apple": "doc1,doc2,doc3,doc4,doc5",
    "banana": "doc1,doc2,doc3,doc4,doc5",
    "cat": "doc1,doc2,doc3,doc4,doc5",
    "zebra": "doc6",
}
