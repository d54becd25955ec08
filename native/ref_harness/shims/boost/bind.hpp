/* shim: std::bind + placeholders stand in for boost::bind */
#pragma once
#include <functional>
namespace boost {
using std::bind;
namespace placeholders = std::placeholders;
}
