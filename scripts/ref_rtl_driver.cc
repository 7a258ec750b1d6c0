// Differential-test driver: right-to-left ChartState composition using the
// REFERENCE's own lm/left.hh (headers included from /root/reference, not
// copied). Reads sentences from stdin (one per line), prints the composed
// log10 score per line. Args: <arpa> <plain|rest> <bos|nobos>.
// Built/used by scripts/diff_reference.py.
#include "lm/left.hh"
#include "lm/model.hh"
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

using namespace lm::ngram;

template <class M>
void run(const char *arpa, bool bos) {
  Config config;
  config.arpa_complain = Config::NONE;
  config.messages = NULL;
  M m(arpa, config);
  std::string line;
  std::cout.precision(10);
  while (std::getline(std::cin, line)) {
    std::vector<lm::WordIndex> ids;
    std::istringstream ss(line);
    std::string w;
    while (ss >> w) ids.push_back(m.GetVocabulary().Index(w));
    float total = 0.0;
    ChartState state;
    state.left.length = 0;
    state.right.length = 0;
    state.left.full = false;
    for (std::vector<lm::WordIndex>::reverse_iterator it = ids.rbegin();
         it != ids.rend(); ++it) {
      ChartState copy(state);
      RuleScore<M> sc(m, state);
      sc.Terminal(*it);
      sc.NonTerminal(copy, total);
      total = sc.Finish();
    }
    if (bos) {
      ChartState copy(state);
      RuleScore<M> sc(m, state);
      sc.BeginSentence();
      sc.NonTerminal(copy, total);
      total = sc.Finish();
    }
    std::cout << total << "\n";
  }
}

int main(int argc, char **argv) {
  bool rest = std::string(argv[2]) == "rest";
  bool bos = std::string(argv[3]) == "bos";
  if (rest)
    run<RestProbingModel>(argv[1], bos);
  else
    run<Model>(argv[1], bos);
  return 0;
}
