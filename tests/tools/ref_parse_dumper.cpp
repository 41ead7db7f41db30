// Conformance harness: run the reference HTML parser (compiled unmodified
// from /root/reference) over a file and dump every observable output:
// english flag, base, title words, body words + flags, links + anchor text.
// Used by tests/test_htmlparser.py to pin the Python port byte-for-byte.
//
// Build: g++ -O2 -std=c++17 -pthread -o ref_parse_dumper ref_parse_dumper.cpp \
//            /root/reference/engine/parser/HtmlParser.cpp \
//            /root/reference/engine/parser/HtmlTags.cpp
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <iostream>
#include <vector>

#include "../../../reference/engine/parser/HtmlParser.h"

int main(int argc, char** argv) {
    if (argc < 2) {
        std::cerr << "usage: ref_parse_dumper FILE\n";
        return 2;
    }
    FILE* f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = new char[size + 1];
    if (fread(buf, 1, size, f) != (size_t)size) { perror("read"); return 1; }
    buf[size] = '\0';
    fclose(f);

    HtmlParser p(buf, size);

    std::cout << "ENGLISH " << (p.english ? 1 : 0) << "\n";
    std::cout << "BASE " << p.base << "\n";
    std::cout << "TITLE " << p.titleWords.size() << "\n";
    for (const auto& w : p.titleWords) std::cout << w << "\n";
    std::cout << "BODY " << p.words_flags.size() << "\n";
    for (const auto& wf : p.words_flags)
        std::cout << (int)wf.flags << " " << wf.word << "\n";
    std::cout << "LINKS " << p.links.size() << "\n";
    for (const auto& l : p.links) {
        std::cout << "URL " << l.URL << " " << l.anchorText.size() << "\n";
        for (const auto& a : l.anchorText) std::cout << a << "\n";
    }
    std::cout << "TITLECHUNK " << p.title_chunk << "\n";
    return 0;
}
