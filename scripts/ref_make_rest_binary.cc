// Differential-harness helper (like ref_rtl_driver.cc): load an ARPA as
// the reference's RestProbingModel (REST_MAX default) and write the
// binary, so our REST_PROBING binary reader has a golden input.
// build_binary only reaches REST_PROBING via -r/REST_LOWER, hence this.
#include "lm/model.hh"
int main(int argc, char **argv) {
  if (argc != 3) return 1;
  lm::ngram::Config config;
  config.write_mmap = argv[2];
  lm::ngram::RestProbingModel model(argv[1], config);
  return 0;
}
