// Conformance harness: feeds words (one per line, stdin) through the
// reference stemmer (compiled unmodified from /root/reference) and prints
// the stem per line. Used by tests/test_stemmer.py to pin the Python port.
//
// Build: g++ -O2 -std=c++17 -o ref_stem_dumper ref_stem_dumper.cpp \
//            /root/reference/engine/lib/stemmer/stemmer.cpp
#include <iostream>
#include <string>

#include "../../../reference/engine/lib/stemmer.h"

int main() {
    std::string line;
    while (std::getline(std::cin, line)) {
        std::cout << Stemmer::stem(line) << "\n";
    }
    return 0;
}
