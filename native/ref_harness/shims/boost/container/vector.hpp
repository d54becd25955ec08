/* shim: boost::container::vector -> std::vector */
#pragma once
#include <vector>
namespace boost { namespace container { using std::vector; } }
