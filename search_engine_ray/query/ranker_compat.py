"""Conformance-exact port of the reference ranker + serving loop.

Transliterated from /root/reference/engine/ranker/Ranker.cpp (+ .hpp
constants) and the csolver chunk loop/merge (csolver.cpp:94-149).

Conformance frame (documented deviations from the raw reference binary):
- single-threaded doc scan. The reference runs 14 worker threads sharing
  the root ISR (Ranker.cpp:556) whose per-thread term-ISR states make
  results scheduling-dependent; one thread = the deterministic semantics
  (equivalent to NUM_THREADS=1).
- uint32 Location arithmetic wraps exactly like the C++ (u32 below):
  expected positions use negative offsets cast to uint32
  (Ranker.cpp:213-220) and Seek targets may underflow (Ranker.cpp:43).
- asserts off (see ISRContainerC for NOT queries).

The chunk scan processes docs in location order via root.next(), scores
with ExtractStaticFeatures/CalculateStaticScore (R2) and the span-based
dynamic scorer (R3/R4, with the synonym-blend fallback F6), inserts into a
fixed top-10 (R5), stops after MAX_DOCS=100 accepted docs per chunk, stops
ranking chunks past MAX_RANKED_DOCS=200 accumulated results, and merges
descending (R6). All floats are float64 with custom_exp — never math.exp.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..kernels.textutils import custom_exp
from .isr_compat import ISRDocC, WordPost

MASK32 = 0xFFFFFFFF


def u32(x: int) -> int:
    return x & MASK32


# Ranker.hpp:83-114
CLOSE_THRESHOLD = 10
TOP_POSITION_THRESHOLD = 100
MOST_WORDS_RATIO = 0.7
SHORT_SPAN_WEIGHT = 0.04
SHORTEST_SPAN_WEIGHT = 0.08
CLOSE_SPAN_WEIGHT = 0.23
ORDERED_SPAN_WEIGHT = 0.10
EXACT_PHRASE_WEIGHT = 0.55
TOP_POSITION_WEIGHT = 1.0
ALL_FREQUENT_WEIGHT = 0.57
MOST_FREQUENT_WEIGHT = 0.29
SOME_FREQUENT_WEIGHT = 0.14
NON_ENGLISH_WEIGHT = 0.14
TITLE_WEIGHT = 0.7
BODY_WEIGHT = 0.3
MAX_DOCS = 100
STATIC_THRESHOLD = 0.25
DYNAMIC_THRESHOLD = 0.1
OPTIMAL_TITLE_LENGTH = 10.0
TITLE_LENGTH_WEIGHT = 0.15
UTILITY_PAGE_PENALTY = 0.15
URL_LENGTH_WEIGHT = 0.35
TLD_WEIGHT = 0.35
DOC_LENGTH_WEIGHT = 0.15
SYN_WEIGHT = 0.4
ORIGIN_WEIGHT = 0.6
URL_TERM_MATCH_BOOST = 1.2
FREQUENT_THRESHOLD = 0.01
MAX_RESULTS = 10       # csolver.h:13
MAX_RANKED_DOCS = 200  # csolver.h:14

# Ranker.cpp:267-297 — indexed by the TLD enum (HashBlob.h:29)
_TLD_SCORE = [0.05, 1.0, 0.95, 0.9, 0.75, 0.7, 0.6, 0.4, 0.3, 0.2, 0.1,
              0.7, 0.6]

_UTILITY_PATTERNS = ("privacy", "terms", "404", "error", "policy", "legal")
_UTILITY_TERMS = ("privacy", "terms", "policy", "legal", "contact", "about",
                  "cookies")


@dataclass
class Span:
    term_count: int = 1
    is_exact_phrase: bool = True
    is_ordered: bool = True
    is_close: bool = True
    is_bold_heading: bool = False


@dataclass
class DynamicFeatures:
    exact_phrase_count: int = 0
    ordered_count: int = 0
    close_count: int = 0
    double_count: int = 0
    triple_count: int = 0
    bold_heading_count: int = 0
    term_frequencies: list = field(default_factory=list)
    top_position_spans: int = 0
    first_span_position: int = MASK32
    has_url_match: bool = False


def is_utility_page(url: str) -> bool:
    low = url.lower()
    return any(p in low for p in _UTILITY_PATTERNS)


def separate_isrs(terms):
    """separateISRs (Ranker.cpp:418-437)."""
    title, body, title_syn, body_syn = [], [], [], []
    for t in terms:
        key = t.get_key()
        syn = t.is_synonym_word()
        if key and key[0] == "@":
            (title_syn if syn else title).append(t)
        else:
            (body_syn if syn else body).append(t)
    return title, body, title_syn, body_syn


def find_best_span(index, rarest, other_terms, target_pos,
                   expected_positions) -> Span:
    """FindBestSpan (Ranker.cpp:17-77)."""
    span = Span()
    doc_isr = index.open_isr_enddoc()
    doc_isr.seek(target_pos)
    doc_end = doc_isr.end_location()

    prev_location = 0
    for i, term in enumerate(other_terms):
        if expected_positions[i] == 1:
            prev_location = target_pos
        expected = u32(target_pos + expected_positions[i])
        post = term.seek(u32(expected - CLOSE_THRESHOLD))
        span.is_exact_phrase = False
        span.is_ordered = False
        span.is_close = False
        hi = u32(expected + CLOSE_THRESHOLD)
        while post is not None and post.loc <= hi and post.loc <= doc_end:
            pos = post.loc
            dist = pos - expected  # long arithmetic on uint32 values
            if isinstance(post, WordPost) and (post.flags & 0x03):
                span.is_bold_heading = True
            if pos > prev_location:
                span.is_ordered = True
                prev_location = pos
            if dist == 0:
                span.is_exact_phrase = True
            if abs(dist) <= CLOSE_THRESHOLD and not span.is_close:
                span.term_count += 1
                span.is_close = True
            post = term.next_internal()
    return span


def extract_dynamic_features(index, start, end, query_terms,
                             url=None) -> DynamicFeatures:
    """ExtractDynamicFeatures (Ranker.cpp:157-265)."""
    f = DynamicFeatures()
    if not query_terms:
        return f
    f.term_frequencies = [0] * len(query_terms)
    rarest = None
    rarest_index = 0
    min_freq = None
    url_str = url.lower() if url is not None else ""

    for i, term in enumerate(query_terms):
        f.term_frequencies[i] = term.get_occurrences_in_curr_doc(start, end)
        if not f.has_url_match and url_str:
            if term.get_key().lower() in url_str:
                f.has_url_match = True
        tf = f.term_frequencies[i]
        if tf > 0 and (min_freq is None or tf < min_freq):
            min_freq = tf
            rarest = term
            rarest_index = i

    if rarest is None:
        return f

    other_terms = []
    expected_positions = []
    for i, term in enumerate(query_terms):
        if i != rarest_index:
            other_terms.append(term)
            expected_positions.append(u32(i - rarest_index))

    post = rarest.seek(start)
    while post is not None and post.loc <= end:
        pos = post.loc
        if f.first_span_position == MASK32:
            f.first_span_position = pos
        span = find_best_span(index, rarest, other_terms, pos,
                              expected_positions)
        if span.is_bold_heading or (post.flags & 0x03):
            f.bold_heading_count += 1
        if span.is_exact_phrase:
            f.exact_phrase_count += 1
        elif span.is_ordered:
            f.ordered_count += 1
        elif span.is_close:
            f.close_count += 1
        if span.term_count == 2:
            f.double_count += 1
        elif span.term_count >= 3 or len(query_terms) == 1:
            f.triple_count += 1
        if pos <= TOP_POSITION_THRESHOLD:
            f.top_position_spans += 1
        post = rarest.next_internal()
    return f


def analyze_query_intent(query_terms):
    """AnalyzeQueryIntent (Ranker.cpp:126-155) → is_utility_query."""
    if not query_terms:
        return False
    for term in query_terms[1:]:
        if term.get_key() in _UTILITY_TERMS:
            return True
    return False


def calculate_static_score(word_count, url_length, title_length, tld,
                           english, utility_page, query_terms) -> float:
    """CalculateStaticScore (Ranker.cpp:299-333)."""
    url_score = custom_exp(-0.02 * url_length)
    tld_score = _TLD_SCORE[tld] if tld < len(_TLD_SCORE) else 0.05
    length_diff = word_count - 600.0
    doc_length_score = 1.0 / (1.0 + (length_diff * length_diff) / 250000.0)
    title_diff = (title_length - OPTIMAL_TITLE_LENGTH
                  if title_length > OPTIMAL_TITLE_LENGTH else 0)
    title_length_score = custom_exp(-0.08 * title_diff)
    base = (url_score * URL_LENGTH_WEIGHT + tld_score * TLD_WEIGHT
            + doc_length_score * DOC_LENGTH_WEIGHT
            + title_length_score * TITLE_LENGTH_WEIGHT)
    if not english:
        base *= NON_ENGLISH_WEIGHT
    if utility_page and not analyze_query_intent(query_terms):
        base *= UTILITY_PAGE_PENALTY
    return base


def calculate_dynamic_score(f: DynamicFeatures, is_title: bool,
                            doc_length: int) -> float:
    """CalculateDynamicScore (Ranker.cpp:335-399)."""
    total = (f.exact_phrase_count + f.ordered_count + f.close_count
             + f.double_count + f.triple_count)
    span_score = (f.exact_phrase_count * EXACT_PHRASE_WEIGHT
                  + f.ordered_count * ORDERED_SPAN_WEIGHT
                  + f.close_count * CLOSE_SPAN_WEIGHT
                  + f.double_count * SHORTEST_SPAN_WEIGHT
                  + f.triple_count * SHORT_SPAN_WEIGHT)
    if total > 0:
        span_score /= total
        if not is_title:
            span_boost = 0.3 + 0.7 / (
                1.0 + custom_exp(-1.2 * (total - 4)))
            bold_boost = 0.7 + 0.3 / (
                1.0 + custom_exp(-4 * (float(f.bold_heading_count) - 1)))
            span_score *= span_boost * bold_boost
    position_score = f.top_position_spans * TOP_POSITION_WEIGHT
    freq_score = 0.0
    if f.term_frequencies:
        frequent = 0
        for tf in f.term_frequencies:
            # C++ divides doubles; docLength==0 gives IEEE inf (tf>0) or
            # nan (0/0) — inf passes the >= test, nan fails (Ranker.cpp:374)
            if doc_length == 0:
                if tf > 0:  # +inf >= threshold
                    frequent += 1
            elif tf / float(doc_length) >= FREQUENT_THRESHOLD:
                frequent += 1
        n = len(f.term_frequencies)
        if frequent == n:
            freq_score = ALL_FREQUENT_WEIGHT
        elif frequent >= n * MOST_WORDS_RATIO:
            freq_score = MOST_FREQUENT_WEIGHT
        elif frequent > 0:
            freq_score = SOME_FREQUENT_WEIGHT
    base = span_score * 0.5 + position_score * 0.3 + freq_score * 0.2
    if f.has_url_match and is_title:
        base *= URL_TERM_MATCH_BOOST
    return base


def insert_result(results: list, new_result, max_results: int) -> None:
    """InsertResult (Ranker.cpp:401-416): bounded insertion sort desc."""
    if len(results) < max_results:
        results.append(new_result)
    elif new_result[2] <= results[-1][2]:
        return
    else:
        results[-1] = new_result
    i = len(results) - 1
    while i > 0 and results[i - 1][2] < new_result[2]:
        results[i] = results[i - 1]
        i -= 1
    results[i] = new_result


def rank_chunk(index, plan, max_results: int = MAX_RESULTS) -> list:
    """Single-threaded WorkerThread loop (Ranker.cpp:439-547) over one
    chunk. Returns [(url, title, score), ...] descending."""
    from .compat_tree import build_isr_root

    root = build_isr_root(index, plan)
    results: list = []
    if root is None:
        return results

    terms = []
    seen: set = set()
    root.collect_terms(index, terms, seen)
    title_w, body_w, title_syn, body_syn = separate_isrs(terms)

    last_doc_id = 0
    processed = 0
    while True:
        doc = root.next()
        if doc is None:
            break
        if doc.start() <= last_doc_id:
            break  # looping protection (Ranker.cpp:460-464)
        last_doc_id = doc.start()
        doc_end = root.get_current_doc()
        if doc_end is None:
            break
        start, end = doc_end.start(), doc_end.end()
        attr = index.attrs[doc_end.doc_id]

        static_score = calculate_static_score(
            attr["word_count"], attr["url_length"], attr["title_length"],
            attr["tld"], attr["english"], is_utility_page(attr["url"]),
            terms)
        if attr["title_length"] > OPTIMAL_TITLE_LENGTH * 4:
            continue
        if static_score < STATIC_THRESHOLD:
            continue

        for t in terms:  # SeekToDocStart (Ranker.cpp:11-15)
            t.seek(start)

        tf_feat = extract_dynamic_features(index, start, end, title_w,
                                           attr["url"])
        bf_feat = extract_dynamic_features(index, start, end, body_w)
        title_score = calculate_dynamic_score(tf_feat, True,
                                              attr["title_length"])
        body_score = calculate_dynamic_score(
            bf_feat, False, attr["word_count"] - attr["title_length"])
        dynamic = TITLE_WEIGHT * title_score + BODY_WEIGHT * body_score
        if dynamic < DYNAMIC_THRESHOLD:
            tf_feat = extract_dynamic_features(index, start, end, title_syn,
                                               attr["url"])
            bf_feat = extract_dynamic_features(index, start, end, body_syn)
            title_score = calculate_dynamic_score(tf_feat, True,
                                                  attr["title_length"])
            body_score = calculate_dynamic_score(
                bf_feat, False, attr["word_count"] - attr["title_length"])
            new_score = TITLE_WEIGHT * title_score + BODY_WEIGHT * body_score
            dynamic = new_score * SYN_WEIGHT + dynamic * ORIGIN_WEIGHT
            if dynamic < DYNAMIC_THRESHOLD:
                continue
        final = dynamic * 0.75 + static_score * 0.25

        # C++ falls back to url only on a NULL title pointer — which never
        # happens (SetDocumentAttributes always strdups); an EMPTY title
        # stays empty (Ranker.cpp:521)
        insert_result(results, (attr["url"], attr["title"], final),
                      max_results)
        processed += 1
        if processed >= MAX_DOCS:
            break
    return results


def merge_chunk_results(arrays: list[list]) -> list:
    """csolver mergeSortedArrays (csolver.cpp:94-121): repeatedly pick the
    max head, cap MAX_RESULTS."""
    indices = [0] * len(arrays)
    out = []
    while len(out) < MAX_RESULTS:
        best_val = None
        best = -1
        for i, arr in enumerate(arrays):
            if indices[i] < len(arr):
                score = arr[indices[i]][2]
                if best_val is None or score > best_val:
                    best_val = score
                    best = i
        if best == -1:
            break
        out.append(arrays[best][indices[best]])
        indices[best] += 1
    return out


def rank_chunks(chunks: list, plan) -> list:
    """csolver per-request chunk loop (csolver.cpp:123-153)."""
    all_results = []
    results_size = 0
    for index in chunks:
        partial = rank_chunk(index, plan)
        results_size += len(partial)
        all_results.append(partial)
        if results_size > MAX_RANKED_DOCS:
            break
    return merge_chunk_results(all_results)
