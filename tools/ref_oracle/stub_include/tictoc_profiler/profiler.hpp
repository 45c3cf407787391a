// Stub profiler so the reference library links without boost/ROS.
#pragma once
#include <iostream>
#include <string>

namespace ca {
class Profiler {
 public:
  static void enable() {}
  static void tictoc(const std::string&) {}
  static void print_aggregated(std::ostream&) {}
};
}  // namespace ca
