// Conformance harness for the reference FRONT-END result merge
// (query/query.cpp:738-770 mergeSortedArrays): the reference merges the
// per-node descending result lists by repeatedly picking the SMALLEST
// current head (an ascending merge — the documented reference bug, R7 in
// SURVEY.md §2.8) with first-array tie-win and URL dedup that still
// advances the losing cursor.
//
// The reference translation units are compiled untouched; this harness
// only feeds fixture arrays through the real function.
//
// Build:
//   g++ -O2 -std=c++17 -pthread -o ref_merge_harness ref_merge_harness.cpp \
//     /root/reference/query/query.cpp /root/reference/query/synsets.cpp \
//     /root/reference/engine/lib/stemmer/stemmer.cpp
//
// Input (stdin, text):
//   n_arrays
//   then per array: n_items, then n_items lines "score_bits_hex<TAB>url"
// Output: merged order, one line per result "score_bits_hex<TAB>url".

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "../../../reference/query/query.h"

// query.cpp defines this at global scope (it opens with `using
// namespace Query;` rather than a namespace block)
std::vector<Query::SearchResult> mergeSortedArrays(
    const std::vector<std::vector<Query::SearchResult>>& arrays);

int main() {
    int n_arrays;
    if (scanf("%d", &n_arrays) != 1) return 1;
    std::vector<std::vector<Query::SearchResult>> arrays(n_arrays);
    for (int i = 0; i < n_arrays; ++i) {
        int n;
        if (scanf("%d", &n) != 1) return 1;
        for (int j = 0; j < n; ++j) {
            unsigned long long bits;
            char url[4096];
            if (scanf("%llx\t%4095s", &bits, url) != 2) return 1;
            Query::SearchResult r;
            r.url = url;
            r.title = url;
            std::memcpy(&r.score, &bits, sizeof(bits));
            arrays[i].push_back(r);
        }
    }
    auto merged = mergeSortedArrays(arrays);
    for (const auto& r : merged) {
        unsigned long long bits;
        std::memcpy(&bits, &r.score, sizeof(bits));
        printf("%016llx\t%s\n", bits, r.url.c_str());
    }
    return 0;
}
