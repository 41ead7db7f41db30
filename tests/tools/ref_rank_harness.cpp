// Conformance harness: run the REFERENCE indexer + csolver ISR tree +
// ranker (compiled unmodified from /root/reference) over a corpus and a
// set of serialized query plans, single-threaded, and dump exact results.
//
// This defines the conformance target for rank-identity: the reference's
// own RankResults spawns 14 racing threads whose per-thread term-ISR state
// makes output scheduling-dependent (Ranker.cpp:439-547,556); this harness
// runs the identical WorkerThread body on one thread — the deterministic
// semantics our Python compat engine must reproduce bit-for-bit.
//
// `#define private public` is a test-only trick to reach Ranker's private
// scoring methods; the reference translation units are compiled untouched.
//
// Input (argv[1], host-endian binary):
//   u32 n_docs; n_docs × { u32 url_len, url, u32 html_len, html }
//   u32 chunk_size
//   u32 n_queries; n_queries × { u32 len, wire_bytes }   (protocol_query.h)
// Output: per query "QUERY i", then "R <score-bits-hex>\t<url>\t<title>",
// then "END".
//
// Build (NOTE -DNDEBUG: the conformance frame is asserts-off — the stock
//   csolver build aborts on NOT queries via ISRContainer's live assert):
//   g++ -O2 -std=c++17 -pthread -DNDEBUG -o ref_rank_harness ref_rank_harness.cpp \
//     /root/reference/engine/csolver/isr.cpp \
//     /root/reference/engine/csolver/ast.cpp \
//     /root/reference/engine/ranker/Ranker.cpp \
//     /root/reference/engine/parser/HtmlParser.cpp \
//     /root/reference/engine/parser/HtmlTags.cpp \
//     /root/reference/engine/lib/stemmer/stemmer.cpp

#define private public
#include "../../../reference/engine/csolver/isr.h"
#include "../../../reference/engine/csolver/ast.h"
#include "../../../reference/engine/ranker/Ranker.hpp"
#undef private

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <sys/socket.h>
#include <unistd.h>

namespace Ranker {
// defined in Ranker.cpp (no header declaration)
void separateISRs(std::vector<ISRWord*>& terms, std::vector<ISRWord*>& title_words,
                  std::vector<ISRWord*>& body_words, std::vector<ISRWord*>& title_syn_words,
                  std::vector<ISRWord*>& body_syn_words);
}

static uint32_t read_u32(FILE* f) {
    uint32_t v = 0;
    if (fread(&v, 4, 1, f) != 1) { fprintf(stderr, "short read\n"); exit(1); }
    return v;
}

static std::string read_blob(FILE* f) {
    uint32_t n = read_u32(f);
    std::string s(n, '\0');
    if (n && fread(&s[0], 1, n, f) != n) { fprintf(stderr, "short read\n"); exit(1); }
    return s;
}

// single-threaded replica of Ranker::WorkerThread (Ranker.cpp:439-547)
static std::vector<RankingResult> rank_single(ISR_Tree* tree, IndexBlob* index) {
    std::vector<RankingResult> results;
    ISR* root = tree->get_root();
    if (!root) return results;

    Ranker::Ranker rk(index, 10);
    Location lastDocID = 0;
    uint32_t processedDocs = 0;

    auto termsCopy = tree->getFlattenedTerms();
    std::vector<ISRWord*> title_words, body_words, title_syn_words, body_syn_words;
    Ranker::separateISRs(termsCopy, title_words, body_words, title_syn_words, body_syn_words);

    while (true) {
        Post* doc = root->Next();
        if (!doc) break;
        if (doc->GetStartLocation() <= lastDocID) break;
        lastDocID = doc->GetStartLocation();
        auto docEnd = root->GetCurrentDoc();
        if (!docEnd) break;
        auto start = docEnd->GetStartLocation();
        auto end = docEnd->GetEndLocation();
        auto attributes = index->GetDocAttributes(docEnd->GetID());

        auto static_features = rk.ExtractStaticFeatures(start, end, attributes);
        double staticScore = rk.CalculateStaticScore(static_features, termsCopy);

        if (static_features.titleLength > Ranker::Ranker::OPTIMAL_TITLE_LENGTH * 4) continue;
        if (staticScore < Ranker::Ranker::STATIC_THRESHOLD) continue;

        rk.SeekToDocStart(termsCopy, start);

        auto title_features = rk.ExtractDynamicFeatures(start, end, title_words, attributes->url);
        auto body_features = rk.ExtractDynamicFeatures(start, end, body_words);
        double titleScore = rk.CalculateDynamicScore(title_features, true, attributes->titleLength);
        double bodyScore =
          rk.CalculateDynamicScore(body_features, false, attributes->wordCount - attributes->titleLength);
        double dynamicScore = Ranker::Ranker::TITLE_WEIGHT * titleScore + Ranker::Ranker::BODY_WEIGHT * bodyScore;

        if (dynamicScore < Ranker::Ranker::DYNAMIC_THRESHOLD) {
            title_features = rk.ExtractDynamicFeatures(start, end, title_syn_words, attributes->url);
            body_features = rk.ExtractDynamicFeatures(start, end, body_syn_words);
            titleScore = rk.CalculateDynamicScore(title_features, true, attributes->titleLength);
            bodyScore =
              rk.CalculateDynamicScore(body_features, false, attributes->wordCount - attributes->titleLength);
            double newScore = Ranker::Ranker::TITLE_WEIGHT * titleScore + Ranker::Ranker::BODY_WEIGHT * bodyScore;
            dynamicScore = newScore * Ranker::Ranker::SYN_WEIGHT + dynamicScore * Ranker::Ranker::ORIGIN_WEIGHT;
            if (dynamicScore < Ranker::Ranker::DYNAMIC_THRESHOLD) continue;
        }
        double finalScore = dynamicScore * 0.75 + staticScore * 0.25;

        RankingResult result;
        result.url = attributes->url;
        result.title = (attributes->title) ? attributes->title : attributes->url;
        result.score = finalScore;

        rk.InsertResult(results, result);
        processedDocs++;
        if (processedDocs >= Ranker::Ranker::MAX_DOCS) break;
    }

    for (auto& isr : termsCopy) delete isr;
    return results;
}

// csolver mergeSortedArrays (csolver.cpp:94-121)
static std::vector<RankingResult>
merge_sorted(const std::vector<std::vector<RankingResult>>& arrays) {
    size_t k = arrays.size();
    std::vector<size_t> indices(k, 0);
    std::vector<RankingResult> result;
    const size_t MAX_RESULTS = 10;  // csolver.h:13
    while (result.size() < MAX_RESULTS) {
        double maxVal = -1e300;
        int minArray = -1;
        for (size_t i = 0; i < k; ++i) {
            if (indices[i] < arrays[i].size()) {
                if (arrays[i][indices[i]].score > maxVal) {
                    maxVal = arrays[i][indices[i]].score;
                    minArray = (int)i;
                }
            }
        }
        if (minArray == -1) break;
        result.push_back(arrays[minArray][indices[minArray]]);
        indices[minArray]++;
    }
    return result;
}

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: ref_rank_harness INPUT\n"); return 2; }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }

    uint32_t n_docs = read_u32(f);
    std::vector<std::pair<std::string, std::string>> docs(n_docs);
    for (uint32_t i = 0; i < n_docs; ++i) {
        docs[i].first = read_blob(f);   // url
        docs[i].second = read_blob(f);  // html
    }
    uint32_t chunk_size = read_u32(f);

    // build chunk indexes in given order (Index::Insert, Indexer.hpp:403-445)
    std::vector<IndexBlob*> blobs;
    for (uint32_t base = 0; base < n_docs; base += chunk_size) {
        Index idx;
        for (uint32_t i = base; i < n_docs && i < base + chunk_size; ++i) {
            std::string html = docs[i].second;  // mutable copy
            HtmlParser p(&html[0], html.size());
            p.pageURL = docs[i].first;
            idx.Insert(&p);
        }
        blobs.push_back(IndexBlob::Create(&idx));
    }

    uint32_t n_queries = read_u32(f);
    for (uint32_t q = 0; q < n_queries; ++q) {
        std::string wire = read_blob(f);
        int sv[2];
        if (socketpair(AF_UNIX, SOCK_STREAM, 0, sv) != 0) { perror("socketpair"); return 1; }
        if (write(sv[1], wire.data(), wire.size()) != (ssize_t)wire.size()) { perror("write"); return 1; }

        printf("QUERY %u\n", q);
        try {
            Expr_AST ast(sv[0]);
            // csolver per-request chunk loop (csolver.cpp:123-153)
            std::vector<std::vector<RankingResult>> all;
            uint32_t results_size = 0;
            for (IndexBlob* b : blobs) {
                ISR_Tree tree(b, &ast);
                auto partial = rank_single(&tree, b);
                results_size += partial.size();
                all.push_back(partial);
                if (results_size > 200) break;  // MAX_RANKED_DOCS, csolver.h:14
            }
            for (const auto& r : merge_sorted(all)) {
                uint64_t bits;
                memcpy(&bits, &r.score, 8);
                printf("R %016llx\t%s\t%s\n", (unsigned long long)bits, r.url, r.title);
            }
        } catch (const std::exception& e) {
            printf("ERROR %s\n", e.what());
        }
        printf("END\n");
        close(sv[0]);
        close(sv[1]);
    }
    fclose(f);
    return 0;
}
